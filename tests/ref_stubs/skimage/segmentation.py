def find_boundaries(*a, **k):  # pragma: no cover
    raise NotImplementedError("stub")
