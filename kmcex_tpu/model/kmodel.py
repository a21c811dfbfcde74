"""Placeholder — real KModel lands next."""
class KModel:  # pragma: no cover
    pass
def get_model(*a, **kw):  # pragma: no cover
    raise NotImplementedError
