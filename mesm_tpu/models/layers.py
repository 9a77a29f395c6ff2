"""Shared building blocks: torch-parity inits, LinearBlock, MLP, PReLU.

Parity targets: reference model/model.py (LinearLayer :412, MLP :397) and
torch defaults. Two initializer families appear in the reference:
  - torch nn.Linear defaults (kaiming_uniform(a=sqrt5) == U(+-1/sqrt(fan_in))
    for both kernel and bias) — used by everything MESM constructs directly;
  - xavier_uniform applied post-hoc to every >1-dim param of the T2V encoder
    and DETR transformer (reference model/transformer.py:78-81, 168-171).
"""
from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    flax kernels are (fan_in, fan_out).
    """
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform():
    return nn.initializers.xavier_uniform()


class Dense(nn.Module):
    """nn.Dense with torch-default init and a switchable kernel initializer."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_linear_kernel_init
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
            name="linear",
        )(x)


class PReLU(nn.Module):
    """PReLU with a single learned slope (torch nn.PReLU default, init 0.25).

    The reference instantiates one PReLU per transformer layer via its
    activation factory (reference model/transformer.py:894-906 with
    activation='prelu' from runner.py:199-235), so the slope is a trainable
    per-layer parameter.
    """

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,), jnp.float32)
        return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


def make_activation(name: str):
    if name == "relu":
        return lambda: nn.relu
    if name == "gelu":
        return lambda: nn.gelu
    if name == "prelu":
        return PReLU
    if name == "selu":
        return lambda: jax.nn.selu
    raise ValueError(f"unsupported activation {name}")


def ln_dot_stats(x, scale, bias, eps: float):
    """LayerNorm with MXU-dot statistics (layout-robust reduction).

    Functionally flax nn.LayerNorm (use_fast_variance f32 stats): mean and
    E[x^2] are computed as dot-products with a ones-vector (f32 accumulation
    on the MXU) instead of XLA reduce ops. Why: in the coalesced eval program
    the video-stream tensors live in an L-minor layout (chosen by XLA for the
    packed attention formulations — see parallel/step.py _hoist_video_proj),
    where the feature-axis convert_reduce runs at ~81 GB/s (0.156 ms per
    (128,194,256) site, six sites = 0.93 ms/batch, traces/r3s_hoist2). A dot
    contracting the feature axis tolerates the layout.

    Numerics: mean is exact (bf16 products accumulate in f32 on the MXU);
    E[x^2] squares in the input dtype, so bf16 inputs round each square to
    bf16 (flax converts to f32 first) — a ~0.2% var perturbation. The gate
    for this difference is METRIC parity (scripts/tpu_check.py), same as the
    bf16 in-kernel softmax.

    The ones-vector goes through an optimization_barrier: without it XLA's
    algebraic simplifier rewrites dot(x, ones) straight back into the strided
    reduce this function exists to avoid (verified on v5e — the r4_lnstats
    trace came back byte-identical to control until the barrier was added)."""
    d = x.shape[-1]
    ones = jax.lax.optimization_barrier(jnp.ones((d, 1), x.dtype))
    contract = (((x.ndim - 1,), (0,)), ((), ()))
    mean = jax.lax.dot_general(
        x, ones, contract, preferred_element_type=jnp.float32
    ) / d  # (..., 1) f32
    mean2 = jax.lax.dot_general(
        x * x, ones, contract, preferred_element_type=jnp.float32
    ) / d
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    y = (x.astype(jnp.float32) - mean) * mul + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def apply_ln(parent: nn.Module, norm: nn.LayerNorm, x, *, deterministic: bool = True):
    """Apply `norm` to x, routing to ln_dot_stats where the dispatch says the
    XLA reduce would be layout-crippled. Params are created by the REAL
    nn.LayerNorm on a 1-row slice (dead-code-eliminated), then read from the
    bound parent — checkpoint layout unchanged (same pattern as the fused
    LN->Dense path in LinearBlock)."""
    from mesm_tpu import kernels

    if deterministic and kernels.use_dot_stats_ln(
        x.size // x.shape[-1], x.shape[-1]
    ):
        tiny = x.reshape(-1, x.shape[-1])[:1]
        _ = norm(tiny)
        p = parent.variables["params"][norm.name]
        return ln_dot_stats(x, p["scale"], p["bias"], norm.epsilon)
    return norm(x)


class LinearBlock(nn.Module):
    """[LayerNorm] -> Dropout -> Dense -> [ReLU].

    Parity: reference LinearLayer (model/model.py:412-434) — note the
    LayerNorm is applied to the *input* (pre-projection) and dropout precedes
    the projection.
    """

    features: int
    layer_norm: bool = True
    dropout: float = 0.1
    relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if self.layer_norm:
            from mesm_tpu import kernels

            norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
            proj = Dense(self.features, dtype=self.dtype, name="proj")
            if deterministic and kernels.use_fused_ln_dense(x.shape[-1]):
                # Fused LN->Dense(->ReLU) Pallas path (ops/layer_pallas.py):
                # reads the wide input once instead of three times. Params
                # are created by the REAL submodules on a 1-row slice (the
                # tiny compute is dead-code-eliminated), then read from this
                # bound module's variables — checkpoint layout unchanged.
                import jax

                from ..ops.layer_pallas import fused_ln_dense

                tiny = x.reshape(-1, x.shape[-1])[:1]
                _ = proj(norm(tiny))
                p = self.variables["params"]
                return fused_ln_dense(
                    x,
                    p["norm"]["scale"],
                    p["norm"]["bias"],
                    p["proj"]["linear"]["kernel"],
                    p["proj"]["linear"]["bias"],
                    relu=self.relu,
                    interpret=jax.default_backend() == "cpu",
                )
            x = apply_ln(self, norm, x, deterministic=deterministic)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = proj(x)
        else:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = Dense(self.features, dtype=self.dtype, name="proj")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class InputProj(nn.Module):
    """Stack of n LinearBlocks; the last has no ReLU iff n == depth used.

    Parity: reference input_txt_proj / input_vid_proj construction
    (model/model.py:51-62): relu flags are [True]*3 with index
    n_input_proj-1 set False, truncated to n_input_proj blocks.
    """

    features: int
    n_layers: int = 2
    dropout: float = 0.5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        relu_flags = [True, True, True]
        relu_flags[self.n_layers - 1] = False
        for i in range(self.n_layers):
            x = LinearBlock(
                self.features,
                layer_norm=True,
                dropout=self.dropout,
                relu=relu_flags[i],
                dtype=self.dtype,
                name=f"block{i}",
            )(x, deterministic=deterministic)
        return x


class MLP(nn.Module):
    """num_layers Dense layers with ReLU between (none after the last).

    Parity: reference MLP (model/model.py:397-409). `zero_last` reproduces the
    zero-initialised final layer of the decoder's bbox head
    (reference model/transformer.py:314-321).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    kernel_init: Callable = torch_linear_kernel_init
    zero_last_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            feats = self.output_dim if last else self.hidden_dim
            fan_in = x.shape[-1]
            bias_init = (
                nn.initializers.zeros
                if (last and self.zero_last_bias)
                else torch_linear_bias_init(fan_in)
            )
            x = nn.Dense(
                feats,
                kernel_init=self.kernel_init,
                bias_init=bias_init,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x)
            if not last:
                x = nn.relu(x)
        return x


class FFN(nn.Module):
    """linear1 -> activation -> dropout -> linear2 (transformer feed-forward).

    Parity: the FFN sub-block shared by all reference transformer layers
    (e.g. model/transformer.py:492-494,537).
    """

    dim_feedforward: int
    d_model: int
    dropout: float = 0.1
    activation: str = "prelu"
    kernel_init: Callable = torch_linear_kernel_init
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        act = make_activation(self.activation)()
        fan_in = x.shape[-1]
        d1 = nn.Dense(
            self.dim_feedforward,
            kernel_init=self.kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
            name="linear1",
        )
        d2 = nn.Dense(
            self.d_model,
            kernel_init=self.kernel_init,
            bias_init=torch_linear_bias_init(self.dim_feedforward),
            dtype=self.dtype,
            name="linear2",
        )
        from mesm_tpu import kernels

        n_rows = x.size // x.shape[-1]
        if (
            deterministic
            and self.activation == "prelu"
            and n_rows >= 4096  # tiny FFNs (decoder 10-query, SS-recon) stay on XLA
            and kernels.use_int8_ffn()
        ):
            # Fused int8 FFN Pallas kernel (ops/ffn_pallas.py): int8 MXU
            # matmuls + VMEM-resident hidden activation. Params are created
            # by the REAL submodules on a 1-row slice (tiny compute, DCE'd),
            # then read raw from this bound module — checkpoint layout
            # unchanged. Dropout is a no-op when deterministic, elided.
            import jax

            from ..ops.ffn_pallas import ffn_int8

            tiny = x.reshape(-1, x.shape[-1])[:1]
            _ = d2(act(d1(tiny)))
            p = self.variables["params"]
            return ffn_int8(
                x,
                p["linear1"]["kernel"], p["linear1"]["bias"],
                p["PReLU_0"]["alpha"],
                p["linear2"]["kernel"], p["linear2"]["bias"],
                interpret=jax.default_backend() == "cpu",
            )

        x = d1(x)
        x = act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = d2(x)
        return x
