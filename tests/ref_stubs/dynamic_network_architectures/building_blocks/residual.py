"""Stub: the reference imports BasicBlockD but the paths we exercise never
instantiate it."""


class BasicBlockD:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError("stub")
