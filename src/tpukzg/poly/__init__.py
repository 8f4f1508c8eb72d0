"""Polynomial layer (SURVEY.md component 16)."""

from tpukzg.poly.poly import barycentric_eval, eval_form_quotient  # noqa: F401
