from mcqueens.kernels import delta_e  # noqa: F401
