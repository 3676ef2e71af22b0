from mcqueens.experiments import config, drivers, plotting  # noqa: F401
