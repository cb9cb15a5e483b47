from . import cleaning, dedup, joins, multimodal, quality, relational, similarity, text, windows  # noqa: F401
