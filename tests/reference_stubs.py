"""Import the reference Predictor class without its unavailable deps.

The reference module imports fastapi/librosa/torchaudio at module scope;
none are installed here. Tiny stub modules satisfy the imports (the
functions under golden test never touch them), letting us compare our pure
policy functions against the reference's methods directly.
"""

from __future__ import annotations

import sys
import types


def install_stubs() -> None:
    if "fastapi" not in sys.modules:
        fastapi = types.ModuleType("fastapi")

        class UploadFile:  # noqa: D401 - placeholder
            pass

        fastapi.UploadFile = UploadFile
        sys.modules["fastapi"] = fastapi

    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        librosa.feature = types.ModuleType("librosa.feature")
        sys.modules["librosa"] = librosa

    if "torchaudio" not in sys.modules:
        torchaudio = types.ModuleType("torchaudio")
        torchaudio.functional = types.ModuleType("torchaudio.functional")
        sys.modules["torchaudio"] = torchaudio
        sys.modules["torchaudio.functional"] = torchaudio.functional

    if "av" not in sys.modules:
        # video.py gates `import av`, but stub anyway for determinism.
        pass

    if "mediapipe" not in sys.modules:
        pass  # imported lazily by the reference; never reached in tests


def reference_predictor_cls():
    """Return the reference Predictor class (no model loaded)."""
    install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from app.inference.predictor import Predictor as RefPredictor

    return RefPredictor


def make_reference_policy_holder(**overrides):
    """Instantiate the reference Predictor WITHOUT running __init__ and set
    just the attributes its aggregation helpers read."""
    cls = reference_predictor_cls()
    obj = cls.__new__(cls)
    defaults = dict(
        confidence_smoothing="median",
        trim_ratio=0.1,
        confidence_threshold=0.5,
        mouth_motion_check_enabled=True,
        mouth_motion_low_threshold=0.015,
        mouth_motion_fake_penalty=0.10,
        audio_energy_high_threshold=-25.0,
        audio_energy_low_threshold=-50.0,
        fake_vote_gate=0.15,
        fake_vote_min_windows=5,
        weak_real_gate=0.08,
        weak_real_window_threshold=0.30,
    )
    defaults.update(overrides)
    for k, v in defaults.items():
        setattr(obj, k, v)
    return obj
