"""Plan inspection utilities.

The engine deliberately ships NO custom Catalyst rules or strategies
(SURVEY.md §4.1): every relational operator is expressed declaratively
and Catalyst supplies pushdown, pruning, join selection, and AQE.  What
lives here instead is the tooling to *verify* those properties hold —
used by tests and by the bench audit so plan regressions (a filter that
stops pushing down, a dimension join that stops broadcasting) are
caught mechanically.
"""

from plda_spark.plans.audit import explain_formatted, plan_summary

__all__ = ["explain_formatted", "plan_summary"]
