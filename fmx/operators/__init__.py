from fmx.operators import dedup, multimodal, similarity, text  # noqa: F401
