from .numeric import dsum, dround, davg, dstd, dvar, dcorr  # noqa: F401
