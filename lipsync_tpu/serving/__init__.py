from lipsync_tpu.serving.app import AppState, Server  # noqa: F401
from lipsync_tpu.serving.config import Settings, get_settings  # noqa: F401
