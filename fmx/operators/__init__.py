from fmx.operators import (dedup, dq, layout, multimodal,  # noqa: F401
                           sampling, similarity, temporal, text)
