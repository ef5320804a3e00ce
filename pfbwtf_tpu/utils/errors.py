"""Error handling.

The reference aborts with ``die()`` (utils.c:13-17) on every failure path;
as a library we raise instead, and the CLIs translate to exit(1).
"""


class PfbwtError(RuntimeError):
    pass


def die(msg: str):
    raise PfbwtError(msg)
