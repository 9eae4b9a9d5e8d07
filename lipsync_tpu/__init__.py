"""lipsync_tpu — TPU-native multimodal lip-sync deepfake detection framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
PRADUMAN-KR/Multimodal-Lip-Sync-Deepfake-Detection-System (reference mounted at
/root/reference). The compute path is JAX (flax.linen modules compiled by XLA,
Pallas kernels for hot ops); the runtime around it (video/audio ingest) is C++.

Layout conventions (TPU-first, channels-last):
  * video clips:       ``(B, T, H, W, 3)``  float, [0, 1]
  * mel spectrograms:  ``(B, F, T, 1)``     float, dB
  * token sequences:   ``(B, T, D)``

The reference uses torch NCDHW layouts; :mod:`lipsync_tpu.utils.layout` converts.
"""

__version__ = "0.1.0"

from lipsync_tpu.models.lip_sync_model import LipSyncModel, ModelConfig  # noqa: F401
