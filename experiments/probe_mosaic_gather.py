"""Probe which Pallas/Mosaic gather forms compile on this toolchain.

Each probe runs in a subprocess (Mosaic failures can abort the process).
Usage: python experiments/probe_mosaic_gather.py            # run all
       python experiments/probe_mosaic_gather.py <name>     # child mode
"""
import subprocess
import sys

PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def _compile(kernel, out_shape, *args, grid=None):
    import jax
    from jax.experimental import pallas as pl

    f = pl.pallas_call(kernel, out_shape=out_shape,
                       **({"grid": grid} if grid else {}))
    jax.jit(f).lower(*args).compile()


@probe
def take_along_axis_sublane():
    """Row gather: take_along_axis axis=0 on (1024, 256)."""
    import jax, jax.numpy as jnp

    def k(x_ref, i_ref, o_ref):
        idx = jnp.broadcast_to(i_ref[:].astype(jnp.int32), (1024, 256))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=0)

    _compile(k, jax.ShapeDtypeStruct((1024, 256), jnp.float32),
             jnp.zeros((1024, 256), jnp.float32),
             jnp.zeros((1024, 1), jnp.int32))


@probe
def take_rows():
    """Row gather via jnp.take axis=0."""
    import jax, jax.numpy as jnp

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:, 0].astype(jnp.int32), axis=0)

    _compile(k, jax.ShapeDtypeStruct((1024, 256), jnp.float32),
             jnp.zeros((1024, 256), jnp.float32),
             jnp.zeros((1024, 1), jnp.int32))


@probe
def take_along_axis_lane():
    """Lane gather: take_along_axis axis=1 on (256, 1024)."""
    import jax, jax.numpy as jnp

    def k(x_ref, i_ref, o_ref):
        idx = jnp.broadcast_to(i_ref[:].astype(jnp.int32), (256, 1024))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1)

    _compile(k, jax.ShapeDtypeStruct((256, 1024), jnp.float32),
             jnp.zeros((256, 1024), jnp.float32),
             jnp.zeros((1, 1024), jnp.int32))


@probe
def take_along_axis_lane128():
    """Lane shuffle within 128 lanes: (256, 128) gather axis=1."""
    import jax, jax.numpy as jnp

    def k(x_ref, i_ref, o_ref):
        idx = jnp.broadcast_to(i_ref[:].astype(jnp.int32), (256, 128))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1)

    _compile(k, jax.ShapeDtypeStruct((256, 128), jnp.float32),
             jnp.zeros((256, 128), jnp.float32),
             jnp.zeros((1, 128), jnp.int32))


@probe
def dyn_slice_loop():
    """Per-row dynamic_slice in a fori_loop (scalar row starts)."""
    import jax, jax.numpy as jnp
    from jax import lax

    def k(x_ref, i_ref, o_ref):
        def body(r, _):
            start = i_ref[r, 0]
            o_ref[r, :] = x_ref[start, :]
            return 0
        lax.fori_loop(0, 1024, body, 0)

    _compile(k, jax.ShapeDtypeStruct((1024, 256), jnp.float32),
             jnp.zeros((1024, 256), jnp.float32),
             jnp.zeros((1024, 1), jnp.int32))


@probe
def dyn_slice_pl_ds():
    """Per-row pl.ds dynamic slice (8-row chunks) in a fori_loop."""
    import jax, jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    def k(x_ref, i_ref, o_ref):
        def body(r, _):
            start = i_ref[r, 0]
            o_ref[pl.ds(r * 8, 8), :] = x_ref[pl.ds(start, 8), :]
            return 0
        lax.fori_loop(0, 128, body, 0)

    _compile(k, jax.ShapeDtypeStruct((1024, 256), jnp.float32),
             jnp.zeros((1024, 256), jnp.float32),
             jnp.zeros((128, 1), jnp.int32))


@probe
def onehot_matmul():
    """Gather as one-hot matmul (sanity: this should compile)."""
    import jax, jax.numpy as jnp

    def k(x_ref, i_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1024, 1024), 1)
        oh = (i_ref[:].astype(jnp.int32) == iota).astype(jnp.float32)
        o_ref[:] = jnp.dot(oh, x_ref[:],
                           preferred_element_type=jnp.float32)

    _compile(k, jax.ShapeDtypeStruct((1024, 256), jnp.float32),
             jnp.zeros((1024, 256), jnp.float32),
             jnp.zeros((1024, 1), jnp.int32))


@probe
def dcn_current_kernel():
    """The existing dcn_pallas kernel on an IDAUp-ish shape."""
    import sys
    sys.path.insert(0, "/root/repo")
    import jax, jax.numpy as jnp
    from centerpoly_tpu.kernels.dcn_pallas import deform_conv2d_pallas
    x = jnp.zeros((1, 64, 128, 128), jnp.bfloat16)
    off = jnp.zeros((1, 64, 128, 18), jnp.float32)
    mk = jnp.ones((1, 64, 128, 9), jnp.float32)
    wt = jnp.zeros((3, 3, 128, 128), jnp.bfloat16)
    bs = jnp.zeros((128,), jnp.bfloat16)
    jax.jit(deform_conv2d_pallas).lower(x, off, mk, wt, bs).compile()


def main():
    if len(sys.argv) > 1:
        PROBES[sys.argv[1]]()
        print("COMPILED")
        return
    for name in PROBES:
        r = subprocess.run([sys.executable, __file__, name],
                           capture_output=True, text=True, timeout=600)
        ok = "COMPILED" in r.stdout
        tail = "" if ok else " | " + (r.stderr.strip().splitlines() or ["?"])[-1][:160]
        print(f"{name:28s} {'OK' if ok else 'FAIL'}{tail}")




@probe
def pltpu_roll_dynamic():
    """pltpu.roll with a traced (fori_loop) shift on sublanes."""
    import jax, jax.numpy as jnp
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref):
        def body(u, acc):
            return acc + pltpu.roll(x_ref[:], u, 0)
        o_ref[:] = lax.fori_loop(0, 5, body, jnp.zeros((256, 256),
                                                       jnp.float32))

    _compile(k, jax.ShapeDtypeStruct((256, 256), jnp.float32),
             jnp.zeros((256, 256), jnp.float32))


@probe
def pltpu_roll_dynamic_3d():
    """pltpu.roll with traced shifts on both leading axes of (H, W, C)."""
    import jax, jax.numpy as jnp
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref):
        def body(i, acc):
            u = i // 5
            v = i % 5
            r = pltpu.roll(pltpu.roll(x_ref[:], u, 0), v, 1)
            return acc + r
        o_ref[:] = lax.fori_loop(0, 25, body,
                                 jnp.zeros((64, 64, 128), jnp.float32))

    _compile(k, jax.ShapeDtypeStruct((64, 64, 128), jnp.float32),
             jnp.zeros((64, 64, 128), jnp.float32))
if __name__ == "__main__":
    main()
