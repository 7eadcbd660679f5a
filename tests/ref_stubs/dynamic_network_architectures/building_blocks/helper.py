"""Minimal stand-in for dynamic_network_architectures.building_blocks.helper
(pip package the reference depends on; not installed here). Provides only
the symbols the reference import chain touches."""
from torch import nn


def get_matching_convtransp(conv_op):
    return {nn.Conv1d: nn.ConvTranspose1d, nn.Conv2d: nn.ConvTranspose2d,
            nn.Conv3d: nn.ConvTranspose3d}[conv_op]


def convert_conv_op_to_dim(conv_op):
    return {nn.Conv1d: 1, nn.Conv2d: 2, nn.Conv3d: 3}[conv_op]


def convert_dim_to_conv_op(dim):
    return {1: nn.Conv1d, 2: nn.Conv2d, 3: nn.Conv3d}[dim]


def get_matching_instancenorm(conv_op=None, dimension=None):
    if dimension is None:
        dimension = convert_conv_op_to_dim(conv_op)
    return {1: nn.InstanceNorm1d, 2: nn.InstanceNorm2d,
            3: nn.InstanceNorm3d}[dimension]


def get_matching_pool_op(conv_op=None, dimension=None, adaptive=False,
                         pool_type="max"):
    if dimension is None:
        dimension = convert_conv_op_to_dim(conv_op)
    table = {
        ("max", False): {1: nn.MaxPool1d, 2: nn.MaxPool2d, 3: nn.MaxPool3d},
        ("avg", False): {1: nn.AvgPool1d, 2: nn.AvgPool2d, 3: nn.AvgPool3d},
        ("max", True): {1: nn.AdaptiveMaxPool1d, 2: nn.AdaptiveMaxPool2d,
                        3: nn.AdaptiveMaxPool3d},
        ("avg", True): {1: nn.AdaptiveAvgPool1d, 2: nn.AdaptiveAvgPool2d,
                        3: nn.AdaptiveAvgPool3d},
    }
    return table[(pool_type, adaptive)][dimension]


def maybe_convert_scalar_to_list(conv_op, scalar):
    if isinstance(scalar, (tuple, list)):
        return list(scalar)
    return [scalar] * convert_conv_op_to_dim(conv_op)
