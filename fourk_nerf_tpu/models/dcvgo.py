"""DirectContractedVoxGO: unbounded-360 voxel radiance field.

TPU-native rebuild of /root/reference/lib/dcvgo.py (scene contraction +
cumulative-distance dedup + distortion loss). Implemented after the
bounded/NDC pipeline in the build plan (SURVEY.md section 7 step 9).
"""

from __future__ import annotations


def make_config(*args, **kwargs):  # pragma: no cover - placeholder
    raise NotImplementedError(
        "DirectContractedVoxGO (unbounded-inward) lands after the bounded/NDC "
        "pipeline; see SURVEY.md section 7."
    )
