"""Environment preflight for training/serving.

Analog of `/root/reference/app/training/check_setup.py:1-80`: verifies the
accelerator, native libraries (ingest/haar/mux build), detector data files,
and data directory counts before long runs.

Usage:  python scripts/check_setup.py [--data-dir data/train]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", type=Path, default=None)
    args = p.parse_args(argv)
    failures = 0

    def check(name, fn):
        nonlocal failures
        try:
            detail = fn()
            print(f"[ok]   {name}: {detail}")
        except Exception as e:
            failures += 1
            print(f"[FAIL] {name}: {e}")

    def jax_check():
        import jax

        devs = jax.devices()
        return f"{len(devs)}x {devs[0].platform} ({devs[0].device_kind})"

    def ingest_check():
        from lipsync_tpu.preprocessing import ingest

        lib = ingest.get_native_lib()
        if lib is None:
            raise RuntimeError("native ingest library failed to build")
        return "libingest.so loaded"

    def haar_check():
        from lipsync_tpu.preprocessing.haar import (
            HaarCascade,
            find_cascade_file,
        )

        path = find_cascade_file("haarcascade_frontalface_default.xml")
        if path is None:
            raise RuntimeError("no frontal cascade data file found")
        hc = HaarCascade(path)
        return f"{path.name}: {len(hc.data.stage_thresholds)} stages"

    def mux_check():
        from lipsync_tpu.preprocessing.mux import _get_lib

        _get_lib()
        return "libmux.so loaded"

    def model_check():
        import jax
        import numpy as np
        from lipsync_tpu.models import LipSyncModel, ModelConfig

        cfg = ModelConfig(video_frames=2, crop_size=16, audio_frames=8)
        m = LipSyncModel(cfg)
        v = m.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 2, 16, 16, 3), np.float32),
            np.zeros((1, 80, 8, 1), np.float32),
        )
        n = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
        return f"{n/1e6:.1f}M params initialize"

    check("jax devices", jax_check)
    check("native ingest", ingest_check)
    check("haar cascades", haar_check)
    check("native muxer", mux_check)
    check("model init", model_check)

    if args.data_dir is not None:
        def data_check():
            from lipsync_tpu.training.data import discover_video_samples

            samples = discover_video_samples(args.data_dir)
            real = sum(1 for _, l in samples if l == 1)
            fake = len(samples) - real
            if not samples:
                raise RuntimeError(f"no videos under {args.data_dir}")
            return f"{len(samples)} videos ({real} real / {fake} fake)"

        check("data dir", data_check)

    print(("PREFLIGHT FAILED" if failures else "ALL CHECKS PASSED"))
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
