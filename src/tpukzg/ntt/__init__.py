"""NTT layer (SURVEY.md component 11)."""

from tpukzg.ntt.ntt import NttPlan  # noqa: F401
