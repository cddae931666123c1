from .inspect import PlanSummary, summarize  # noqa: F401
