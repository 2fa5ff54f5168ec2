from fmx.operators import (dedup, dq, multimodal, sampling,  # noqa: F401
                           similarity, temporal, text)
