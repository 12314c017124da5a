"""Measure TPU compile time of interpreter variants to find what makes the
sparse densify expensive (run on the axon relay; each compile is minutes)."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from lapis_silo_tpu.ops import device_engine as de  # noqa: E402

P, R, W, NDYN, K, M, LEN = 1, 8, 31250, 1, 4, 512, 64


def build(variant: str):
    run_one = de.build_run_one_with_emit(LEN, R, NDYN + K, W, sparse_base=NDYN)

    def run_p(code0, code1, bank_p, dyn_p, si, sw, st, ln, full_p, n_instr):
        if variant != "none":
            take = st[:, None] + jnp.arange(M, dtype=jnp.int32)
            valid = jnp.arange(M, dtype=jnp.int32)[None, :] < ln[:, None]
            take = jnp.clip(take, 0, si.shape[0] - 1)
            gi = si[take]
            gw = sw[take]
            if variant == "set_drop":
                leaf = jnp.where(valid, jnp.arange(K, dtype=jnp.int32)[:, None], K)
                sd = (jnp.zeros((K, W), jnp.uint32)
                      .at[leaf, gi].set(gw, mode="drop"))
            elif variant == "add_2d":
                leaf = jnp.where(valid, jnp.arange(K, dtype=jnp.int32)[:, None], K)
                gi = jnp.where(valid, gi, 0)
                gw = jnp.where(valid, gw, 0)
                sd = (jnp.zeros((K + 1, W), jnp.uint32)
                      .at[leaf, gi].add(gw))[:K]
            elif variant == "add_flat":
                leaf = jnp.where(valid, jnp.arange(K, dtype=jnp.int32)[:, None], K)
                gi = jnp.where(valid, gi, 0)
                gw = jnp.where(valid, gw, 0)
                flat = (leaf * W + gi).reshape(-1)
                sd = (jnp.zeros(((K + 1) * W,), jnp.uint32)
                      .at[flat].add(gw.reshape(-1))).reshape(K + 1, W)[:K]
            dyn_p = jnp.concatenate([dyn_p, sd], axis=0)
        return run_one(code0, code1, bank_p, dyn_p, full_p, n_instr)

    def run(code, bank, dyn, si, sw, st, ln, full, n_instr):
        words, outs = jax.vmap(
            run_p, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, None)
        )(code[0], code[1], bank, dyn, si, sw, st, ln, full, n_instr)
        return outs.sum(axis=0, dtype=jnp.int32)

    return jax.jit(run)


def main():
    n_stream = 4096
    args = (
        jnp.zeros((2, LEN), jnp.int32),
        jnp.zeros((P, R, W), jnp.uint32),
        jnp.zeros((P, NDYN, W), jnp.uint32),
        jnp.zeros((P, n_stream), jnp.int32),
        jnp.zeros((P, n_stream), jnp.uint32),
        jnp.zeros((P, K), jnp.int32),
        jnp.zeros((P, K), jnp.int32),
        jnp.zeros((P, W), jnp.uint32),
        jnp.int32(3),
    )
    shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
    for variant in sys.argv[1:] or ["none", "set_drop", "add_2d", "add_flat"]:
        fn = build(variant)
        t0 = time.time()
        lowered = fn.lower(*shapes)
        t1 = time.time()
        lowered.compile()
        t2 = time.time()
        print(f"{variant}: lower {t1 - t0:.1f}s compile {t2 - t1:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
