from mcqueens.core import energy, init, rng, schedules, tables  # noqa: F401
