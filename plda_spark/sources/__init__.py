from .jsonl import read_jsonl, read_jsonl_with_errors, write_dataset  # noqa: F401
from .plda_text import read_plda_corpus, write_plda_corpus  # noqa: F401
from .tables import load_all, load_table  # noqa: F401
from .uci import read_uci_docword, uci_to_corpus  # noqa: F401
