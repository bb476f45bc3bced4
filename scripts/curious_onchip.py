"""CuRIOUS real-landmark cases on the real TPU chip (VERDICT r3 missing#1).

Drives pipeline/challenges.py:curious_case at the reference's CuRIOUS
hyperparameters (grid_sp=6, disp_hw=6, MIND r=d=3,
l2r_2020_convexAdam_CuRIOUS.py:286-287,323) on the vendored real landmark
geometry (tests/curious_real.py: real landmark volumes + TPS-of-real-
correspondences ground truth + synthetic multimodal texture).

Run:
    PYTHONPATH=/root/repo:/root/.axon_site \
    CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache \
    python scripts/curious_onchip.py

Prints one JSON line per case: identity / deformable / rigid mean TRE in
voxels of the 256x256x288 resampled space (the reference reports 0.5x these
numbers as mm).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from convexadam_tpu.pipeline.challenges import curious_case
    from tests.curious_real import build_case

    for case in (1, 13):
        c = build_case(case, margin=32)
        t0 = time.time()
        res = curious_case(
            c["us"], c["t1"], c["flair"], c["seg_us"], c["seg_mri"],
            grid_sp=6, disp_hw=6, mind_r=3, mind_d=3,
            mask_threshold=10.0, rigid_samples=4096,
        )
        print(json.dumps({
            "case": case,
            "shape": list(int(s) for s in c["shape"]),
            "tre0_vox": round(float(np.nanmean(res["tre0"])), 3),
            "tre_def_vox": round(float(np.nanmean(res["tre_def"])), 3),
            "tre_rigid_vox": round(float(np.nanmean(res["tre_rigid"])), 3),
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
