from . import exprs, hashing, text, vectors

__all__ = ["exprs", "hashing", "text", "vectors"]
