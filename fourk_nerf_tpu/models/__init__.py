"""Scene models (radiance fields) and the SR stack.

Model selection rule matches the reference driver
(/root/reference/run.py:286-313): ndc -> DirectMPIGO, unbounded_inward ->
DirectContractedVoxGO, otherwise DirectVoxGO.
"""

from fourk_nerf_tpu.models import dvgo, dmpigo, dcvgo, dvqgo, dbvgo  # noqa: F401


def model_module(ndc: bool, unbounded_inward: bool = False, mode_type: str = ""):
    if ndc:
        return dvqgo if mode_type == "adain_vq" else dmpigo
    if unbounded_inward:
        return dcvgo
    return dvgo
