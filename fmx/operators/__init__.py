from fmx.operators import (dedup, dq, graph, layout,  # noqa: F401
                           multimodal, sampling, similarity, sketches,
                           temporal, text)
