import jax, numpy as np, time, jax.numpy as jnp
from transfusion_tpu.models.transfusion import Transfusion

model = Transfusion(
    num_text_tokens=256, dim_latent=32, modality_default_shape=(14,14),
    transformer=dict(dim=384, depth=8, dim_head=64, heads=8), pad_multiple=64,
)
params = model.init_params(jax.random.PRNGKey(0))
prime_items = [np.asarray([model.sos_id, model.som_ids[0]], np.int32)]
placeholder = np.zeros((14,14,32), np.float32)
packed = model.pack([[*prime_items, (0, placeholder)]]*2, wrap_sos_eos=False, add_meta=False)
print('packed n', packed.seq_len, flush=True)

t0=time.time()
def fwd(params, packed, times):
    return model.core.apply(params, packed, times, return_logits=False, method='joint')[2][0]
jf = jax.jit(fwd)
r = jf(params, jax.tree.map(jnp.asarray, packed), jnp.ones((2, packed.spans.shape[1])))
r.block_until_ready()
print('joint fwd compile+run', time.time()-t0, flush=True)

t0=time.time()
noise = jax.random.normal(jax.random.PRNGKey(1), (14,14,32))
out = model._get_jit('sample_ode', model._sample_ode_impl, static_argnames=('gi','row_cond','row_uncond','span_row','steps','use_cfg'))(
    params, jax.tree.map(jnp.asarray, packed), noise, jnp.float32(3.0),
    gi=0, row_cond=0, row_uncond=1, span_row=0, steps=4, use_cfg=True)
out.block_until_ready()
print('ODE steps=4 compile+run', time.time()-t0, flush=True)

t0=time.time()
out = model._get_jit('sample_ode', model._sample_ode_impl, static_argnames=('gi','row_cond','row_uncond','span_row','steps','use_cfg'))(
    params, jax.tree.map(jnp.asarray, packed), noise, jnp.float32(3.0),
    gi=0, row_cond=0, row_uncond=1, span_row=0, steps=64, use_cfg=True)
out.block_until_ready()
print('ODE steps=64 compile+run', time.time()-t0, flush=True)
t0=time.time()
out = model._get_jit('sample_ode', model._sample_ode_impl, static_argnames=('gi','row_cond','row_uncond','span_row','steps','use_cfg'))(
    params, jax.tree.map(jnp.asarray, packed), noise*2, jnp.float32(3.0),
    gi=0, row_cond=0, row_uncond=1, span_row=0, steps=64, use_cfg=True)
out.block_until_ready()
print('ODE steps=64 warm run', time.time()-t0, flush=True)
