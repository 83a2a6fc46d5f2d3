"""Video scaling & pixel format conversion (libswscale analog)."""
from librempeg_tpu.scale.scaler import Scaler, get_scaler  # noqa: F401
