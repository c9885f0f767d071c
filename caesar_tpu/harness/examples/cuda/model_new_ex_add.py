import torch
import torch.nn as nn
from torch.utils.cpp_extension import load_inline

cuda_source = r"""
#include <torch/extension.h>
#include <cuda_runtime.h>

__global__ void add_kernel(const float* a, const float* b, float* out, int n) {
    int i = blockIdx.x * blockDim.x + threadIdx.x;
    if (i < n) {
        out[i] = a[i] + b[i];
    }
}

torch::Tensor cuda_add(torch::Tensor a, torch::Tensor b) {
    auto out = torch::empty_like(a);
    int n = a.numel();
    int threads = 256;
    int blocks = (n + threads - 1) / threads;
    add_kernel<<<blocks, threads>>>(
        a.data_ptr<float>(), b.data_ptr<float>(), out.data_ptr<float>(), n);
    return out;
}
"""

cpp_source = "torch::Tensor cuda_add(torch::Tensor a, torch::Tensor b);"

add_module = load_inline(
    name="cuda_add_ext",
    cpp_sources=cpp_source,
    cuda_sources=cuda_source,
    functions=["cuda_add"],
    verbose=False,
)


class ModelNew(nn.Module):
    """Element-wise addition using a custom inline CUDA kernel."""

    def __init__(self):
        super().__init__()

    def forward(self, a, b):
        return add_module.cuda_add(a.cuda(), b.cuda())


def get_inputs():
    a = torch.randn(4096, 4096)
    b = torch.randn(4096, 4096)
    return [a, b]


def get_init_inputs():
    return []
