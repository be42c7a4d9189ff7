from .ba import BAProblem, solve_ba  # noqa: F401
