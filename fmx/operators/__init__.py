from fmx.operators import (dedup, dq, features, graph,  # noqa: F401
                           layout, multimodal, profiling, sampling,
                           similarity, sketches, temporal, text, web)
