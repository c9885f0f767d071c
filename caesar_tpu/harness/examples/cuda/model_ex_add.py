import torch
import torch.nn as nn


class Model(nn.Module):
    """Element-wise addition of two tensors."""

    def __init__(self):
        super().__init__()

    def forward(self, a, b):
        return a + b


def get_inputs():
    a = torch.randn(4096, 4096)
    b = torch.randn(4096, 4096)
    return [a, b]


def get_init_inputs():
    return []
