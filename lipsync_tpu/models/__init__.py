from lipsync_tpu.models.lip_sync_model import (  # noqa: F401
    LipSyncModel,
    ModelConfig,
    example_inputs,
)
from lipsync_tpu.models.convert import (  # noqa: F401
    load_torch_checkpoint,
    torch_state_dict_to_variables,
)
