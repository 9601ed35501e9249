import jax.numpy as jnp
import numpy as np
import pytest

from exemplars_vc_tpu.align import dtw
from exemplars_vc_tpu.parallel import make_mesh
from exemplars_vc_tpu.parallel.sharded_long_dtw import backtrace_host, sharded_dtw_long


@pytest.mark.parametrize("n_dev,col_block", [(2, 64), (4, 32), (8, 64)])
def test_matches_single_device(n_dev, col_block):
    rng = np.random.default_rng(0)
    ta, tb, d = 128, 200, 6
    a = rng.standard_normal((ta, d)).astype(np.float32)
    b = rng.standard_normal((tb, d)).astype(np.float32)
    ref = dtw(jnp.asarray(a), jnp.asarray(b))

    mesh = make_mesh(data=n_dev, dict_=1)
    dist, dirs = sharded_dtw_long(a, b, mesh, col_block=col_block)
    assert abs(dist - float(ref.raw_distance)) < 1e-2 * max(1.0, float(ref.raw_distance))

    pi, pj = backtrace_host(dirs)
    pl = int(ref.path_len)
    np.testing.assert_array_equal(pi, np.asarray(ref.path_i[:pl]))
    np.testing.assert_array_equal(pj, np.asarray(ref.path_j[:pl]))


def test_column_padding():
    # tb not divisible by col_block exercises the padded-column masking
    rng = np.random.default_rng(1)
    a = rng.standard_normal((64, 4)).astype(np.float32)
    b = rng.standard_normal((90, 4)).astype(np.float32)
    ref = dtw(jnp.asarray(a), jnp.asarray(b))
    mesh = make_mesh(data=4, dict_=1)
    dist, dirs = sharded_dtw_long(a, b, mesh, col_block=32)
    assert abs(dist - float(ref.raw_distance)) < 1e-2
    pi, pj = backtrace_host(dirs)
    assert pi[-1] == 63 and pj[-1] == 89


def test_distance_only_mode():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((64, 4)).astype(np.float32)
    b = rng.standard_normal((64, 4)).astype(np.float32)
    ref = dtw(jnp.asarray(a), jnp.asarray(b))
    mesh = make_mesh(data=8, dict_=1)
    dist, dirs = sharded_dtw_long(a, b, mesh, col_block=32, keep_dirs=False)
    assert dirs is None
    assert abs(dist - float(ref.raw_distance)) < 1e-2


def test_distance_only_padded_columns():
    # tb not divisible by col_block + distance-only on-the-fly tiles must
    # agree with the path mode exactly (same DP, same halo schedule)
    rng = np.random.default_rng(3)
    a = rng.standard_normal((128, 5)).astype(np.float32)
    b = rng.standard_normal((173, 5)).astype(np.float32)
    mesh = make_mesh(data=4, dict_=1)
    d_path, _ = sharded_dtw_long(a, b, mesh, col_block=48, keep_dirs=True)
    d_only, dirs = sharded_dtw_long(a, b, mesh, col_block=48, keep_dirs=False)
    assert dirs is None
    assert d_only == d_path
