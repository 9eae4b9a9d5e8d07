"""Print checkpoint metadata (epoch, metrics, geometry).

Port of `/root/reference/check_epoch.py` (thin checkpoint inspector).

Usage:  python scripts/check_epoch.py weights/latest [more ckpts...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lipsync_tpu.training.checkpoints import load_metadata  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        argv = ["weights/latest"]
    for path in argv:
        meta = load_metadata(Path(path))
        print(f"{path}: {json.dumps(meta, indent=2) if meta else '(no metadata)'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
