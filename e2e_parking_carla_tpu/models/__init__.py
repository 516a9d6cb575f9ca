"""Policy model family: the LSS-style BEV parking policy in flax.linen.

Camera encoder (EfficientNet-style trunk + DeepLab heads) -> lift-splat BEV
projection -> ResNet BEV encoder -> transformer feature fusion -> seg head +
autoregressive control-token decoder. Channels-last (NHWC) throughout, bf16
compute / f32 params.
"""

from e2e_parking_carla_tpu.models.parking_model import ParkingModel  # noqa: F401
