from lipsync_tpu.inference.calibration import Calibrator  # noqa: F401
from lipsync_tpu.inference.engine import ScoringEngine, load_engine  # noqa: F401
from lipsync_tpu.inference.predictor import (  # noqa: F401
    Predictor,
    PredictorConfig,
)
