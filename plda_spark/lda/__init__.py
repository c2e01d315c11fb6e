from . import corpus, infer, kernel, model, train, vocab  # noqa: F401
