from mcqueens.chain import board, full3d, stats  # noqa: F401
from mcqueens.chain.spec import ChainSpec  # noqa: F401
