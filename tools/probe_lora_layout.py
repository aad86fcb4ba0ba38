"""Compile-only probe: does the blocked expert-LoRA decode program still
materialize the whole-stack layout copy? AOT-lower with abstract shapes,
compile via the TPU backend, print memory_analysis."""
import jax
import jax.numpy as jnp
from jax import ShapeDtypeStruct as SDS

from aria_tpu.config import AriaConfig, TextConfig
from aria_tpu.models.moe_lm import KVCache, init_lm_params, lm_forward
from aria_tpu.ops.quant import fuse_shared_experts, quantize_lm_params_int4

base = AriaConfig.aria_25b()
tc = TextConfig(num_experts=64, num_layers=28)

p_sh = jax.eval_shape(
    lambda k: quantize_lm_params_int4(
        fuse_shared_experts({"lm": init_lm_params(k, tc)})["lm"]),
    jax.random.PRNGKey(0))
cache_sh = jax.eval_shape(lambda: KVCache.init(tc, 8, 512, jnp.int8))

L, A, E = 28, 3, 66
D, I = tc.hidden_size, tc.moe_intermediate_size
bf = jnp.bfloat16
ml = {"layers": {
    "w1": {"a": SDS((L, A, E, D, 4), bf), "b": SDS((L, A, E, 4, 2 * I), bf)},
    "w2": {"a": SDS((L, A, E, I, 4), bf), "b": SDS((L, A, E, 4, D), bf)},
    "wqkv": {"a": SDS((L, A, D, 4), bf), "b": SDS((L, A, 4, tc.q_size + 2 * tc.num_kv_heads * tc.head_dim), bf)},
    "wo": {"a": SDS((L, A, tc.q_size, 4), bf), "b": SDS((L, A, 4, D), bf)},
}}

def step(params, tok, cache, pos, mlt, hot):
    kv_pos = jnp.arange(cache.k.shape[3])
    mask = (kv_pos <= pos)[None, None, None, :]
    out = lm_forward(params, tc, tok[:, None], positions=pos[None], mask=mask,
                     cache=cache, cache_pos=pos,
                     lora=mlt, lora_scale=1.0, lora_onehot=hot)
    return out.logits, out.cache

args = (p_sh, SDS((8,), jnp.int32), cache_sh, SDS((), jnp.int32), ml,
        SDS((A, 8), jnp.float32))
lowered = jax.jit(step, donate_argnums=(2,)).lower(*args)
c = lowered.compile()
print("MEMORY:", c.memory_analysis())
