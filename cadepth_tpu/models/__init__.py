from cadepth_tpu.models.layers import DoubleConv, EncoderBlock, DecoderBlock
from cadepth_tpu.models.film import FiLMLayer, FiLMConvBlock
from cadepth_tpu.models.attention import (
    ChannelAttention,
    SpatialAttention,
    CBAM,
    DepthSpatialAttention,
    CameraAwareSpatialAttention,
)
from cadepth_tpu.models.pcl import PerspectiveCorrectionLayer, Perspective3DTransformer
from cadepth_tpu.models.baseline_unet import BaselineUNet
from cadepth_tpu.models.intrinsics_unet import (
    FiLMDoubleConv,
    IntrinsicsConditionedUNet,
    IntrinsicsAttentionUNet,
)
from cadepth_tpu.models.geometry_aware import (
    RayEnhancedConv,
    GeometryAwareNetwork,
    LightweightGeometryNetwork,
)
from cadepth_tpu.models.factory import create_model, count_parameters, estimate_memory_mb

__all__ = [
    "DoubleConv",
    "EncoderBlock",
    "DecoderBlock",
    "FiLMLayer",
    "FiLMConvBlock",
    "ChannelAttention",
    "SpatialAttention",
    "CBAM",
    "DepthSpatialAttention",
    "CameraAwareSpatialAttention",
    "PerspectiveCorrectionLayer",
    "Perspective3DTransformer",
    "BaselineUNet",
    "FiLMDoubleConv",
    "IntrinsicsConditionedUNet",
    "IntrinsicsAttentionUNet",
    "RayEnhancedConv",
    "GeometryAwareNetwork",
    "LightweightGeometryNetwork",
    "create_model",
    "count_parameters",
    "estimate_memory_mb",
]
