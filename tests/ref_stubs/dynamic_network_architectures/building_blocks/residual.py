"""Functional stand-in for dynamic_network_architectures==0.3.1's
BasicBlockD (building_blocks/residual.py) so the reference UxLSTM nets can
be instantiated for transplant-parity tests.

Mirrors the upstream structure exactly for the configurations the reference
nets use (stride=1, input_channels == output_channels, no dropout, no
stochastic depth, no squeeze-excitation): two ConvDropoutNormReLU blocks
(the second without a nonlinearity), an identity skip, and a trailing
nonlinearity after the residual add. state_dict key layout matches upstream
(conv1.conv / conv1.norm / conv2.conv / conv2.norm; the all_modules
Sequential aliases the same modules, as upstream does).
"""
import torch.nn as nn


def _to_list(v, n=3):
    if isinstance(v, int):
        return [v] * n
    return list(v)


class ConvDropoutNormReLU(nn.Module):
    """simple_conv_blocks.ConvDropoutNormReLU: conv -> (dropout) -> norm ->
    (nonlin), with `all_modules` aliasing the same children."""

    def __init__(self, conv_op, input_channels, output_channels, kernel_size,
                 stride, conv_bias, norm_op=None, norm_op_kwargs=None,
                 dropout_op=None, dropout_op_kwargs=None, nonlin=None,
                 nonlin_kwargs=None, nonlin_first=False):
        super().__init__()
        kernel_size = _to_list(kernel_size)
        padding = [(k - 1) // 2 for k in kernel_size]
        self.conv = conv_op(input_channels, output_channels, kernel_size,
                            stride, padding, bias=conv_bias)
        ops = [self.conv]
        if dropout_op is not None:
            self.dropout = dropout_op(**(dropout_op_kwargs or {}))
            ops.append(self.dropout)
        if norm_op is not None:
            self.norm = norm_op(output_channels, **(norm_op_kwargs or {}))
            ops.append(self.norm)
        if nonlin is not None:
            self.nonlin = nonlin(**(nonlin_kwargs or {}))
            ops.append(self.nonlin)
        self.all_modules = nn.Sequential(*ops)

    def forward(self, x):
        return self.all_modules(x)


class BasicBlockD(nn.Module):
    def __init__(self, conv_op, input_channels, output_channels, kernel_size,
                 stride, conv_bias=False, norm_op=None, norm_op_kwargs=None,
                 dropout_op=None, dropout_op_kwargs=None, nonlin=None,
                 nonlin_kwargs=None, stochastic_depth_p=0.0,
                 squeeze_excitation=False,
                 squeeze_excitation_reduction_ratio=1. / 16):
        super().__init__()
        assert stochastic_depth_p == 0.0 and not squeeze_excitation, \
            "stub supports the reference UxLSTM configurations only"
        self.conv1 = ConvDropoutNormReLU(
            conv_op, input_channels, output_channels, kernel_size, stride,
            conv_bias, norm_op, norm_op_kwargs, dropout_op, dropout_op_kwargs,
            nonlin, nonlin_kwargs)
        self.conv2 = ConvDropoutNormReLU(
            conv_op, output_channels, output_channels, kernel_size, 1,
            conv_bias, norm_op, norm_op_kwargs, dropout_op, dropout_op_kwargs,
            None, None)
        self.nonlin2 = (nonlin(**(nonlin_kwargs or {})) if nonlin is not None
                        else nn.Identity())
        stride_l = _to_list(stride)
        assert all(s == 1 for s in stride_l) and \
            input_channels == output_channels, \
            "stub implements the identity-skip case the reference nets use"
        self.skip = nn.Identity()

    def forward(self, x):
        residual = self.skip(x)
        out = self.conv2(self.conv1(x))
        return self.nonlin2(out + residual)
