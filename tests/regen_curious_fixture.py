"""Build tests/curious_landmarks.npz from the REAL CuRIOUS landmark volumes
shipped in the reference snapshot (l2r_2020_curious_landmarks.zip).

The reference's CuRIOUS script consumes Case<N>-{MRI,US}-landmarks.nii.gz
volumes — landmark balls labelled 1..14 in the 256x256x288 resampled space —
and scores registration by centroid TRE (l2r_2020_convexAdam_CuRIOUS.py:
302-317,380-398).  The image volumes (EASY-RESECT T1/FLAIR/US) are NOT in
the snapshot, so tests reconstruct the landmark volumes exactly (sparse
voxel lists stored here) and synthesize images around the real landmark
geometry with a TPS field interpolating the real MRI<->US correspondences.

Stored per vendored case: sparse (coords int16 (N,3), labels int8 (N,)) for
both modalities.  Centroid tables for ALL cases are stored for reference.

Run: ``python -m tests.regen_curious_fixture`` (needs /root/reference).
"""

import pathlib
import re
import tempfile
import zipfile

import numpy as np

ZIP = "/root/reference/l2r_2020_curious_landmarks.zip"
VENDORED = (1, 12, 13)  # cases reconstructed exactly in tests


def main():
    from convexadam_tpu.geometry.io import load_volume_nib_order
    from convexadam_tpu.pipeline.challenges import landmark_centroids

    out: dict = {}
    with tempfile.TemporaryDirectory() as td, zipfile.ZipFile(ZIP) as zf:
        names = zf.namelist()
        cases = sorted(
            {
                int(m.group(1))
                for n in names
                for m in [re.search(r"Case(\d+)-MRI", n)]
                if m
            }
        )
        zf.extractall(td)
        root = pathlib.Path(td) / "L2R_Task01"
        for nu in cases:
            vols = {}
            for mod in ("MRI", "US"):
                d, _ = load_volume_nib_order(
                    root / f"Case{nu}-{mod}-landmarks.nii.gz"
                )
                d = np.round(d).astype(np.int16)
                vols[mod] = d
                nlm = int(d.max())
                out[f"centroids_{mod}_{nu}"] = landmark_centroids(d, nlm)
                if nu in VENDORED:
                    idx = np.argwhere(d > 0).astype(np.int16)
                    out[f"coords_{mod}_{nu}"] = idx
                    out[f"labels_{mod}_{nu}"] = d[d > 0].astype(np.int8)
            assert vols["MRI"].shape == vols["US"].shape == (256, 256, 288)
    out["cases"] = np.array(cases, np.int32)
    out["vendored"] = np.array(VENDORED, np.int32)
    out["shape"] = np.array((256, 256, 288), np.int32)
    path = pathlib.Path(__file__).parent / "curious_landmarks.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({path.stat().st_size/1024:.0f} KiB, "
          f"{len(cases)} cases, vendored={VENDORED})")


if __name__ == "__main__":
    main()
