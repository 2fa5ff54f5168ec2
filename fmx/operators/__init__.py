from fmx.operators import (dedup, dq, graph, layout,  # noqa: F401
                           multimodal, profiling, sampling, similarity,
                           sketches, temporal, text, web)
