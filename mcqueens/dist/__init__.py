from mcqueens.dist import mesh, runner  # noqa: F401
