from . import dyadic, ibert, ivit, ppoly, quant  # noqa: F401
