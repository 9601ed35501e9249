import jax.numpy as jnp
import numpy as np

from exemplars_vc_tpu.align.viterbi import viterbi_track, viterbi_track_batch


def ref_viterbi(log_density, log_prior, log_transition):
    """Direct numpy transcription of the pyfasst Cython semantics
    (_tracking.pyx:11-93): strict-> update keeps the lowest antecedent."""
    S, N = log_density.shape
    cum = np.zeros((S, N))
    ante = np.zeros((S, N), dtype=int)
    cum[:, 0] = log_prior + log_density[:, 0]
    ante[:, 0] = -1
    for n in range(1, N):
        for s in range(S):
            cum[s, n] = cum[0, n - 1] + log_transition[0, s]
            ante[s, n] = 0
            for sp in range(1, S):
                t = cum[sp, n - 1] + log_transition[sp, s]
                if t > cum[s, n]:
                    cum[s, n] = t
                    ante[s, n] = sp
            cum[s, n] += log_density[s, n]
    path = np.zeros(N, dtype=int)
    path[N - 1] = np.argmax(cum[:, N - 1])
    for n in range(N - 2, -1, -1):
        path[n] = ante[path[n + 1], n + 1]
    return path


def test_matches_pyfasst_semantics():
    rng = np.random.default_rng(0)
    for trial in range(4):
        S, N = int(rng.integers(3, 12)), int(rng.integers(5, 40))
        # integer-valued logs: sums stay exact in float32, so argmax
        # tie-breaking is comparable against the float64 oracle
        ld = rng.integers(-6, 6, (S, N)).astype(np.float64)
        lp = rng.integers(-6, 6, S).astype(np.float64)
        lt = rng.integers(-6, 6, (S, S)).astype(np.float64)
        ref = ref_viterbi(ld, lp, lt)
        got = np.asarray(viterbi_track(jnp.asarray(ld), jnp.asarray(lp), jnp.asarray(lt)))
        np.testing.assert_array_equal(got, ref)


def test_batched():
    rng = np.random.default_rng(1)
    B, S, N = 3, 6, 25
    ld = rng.integers(-6, 6, (B, S, N)).astype(np.float64)
    lp = rng.integers(-6, 6, S).astype(np.float64)
    lt = rng.integers(-6, 6, (S, S)).astype(np.float64)
    got = np.asarray(viterbi_track_batch(jnp.asarray(ld), jnp.asarray(lp), jnp.asarray(lt)))
    for b in range(B):
        np.testing.assert_array_equal(got[b], ref_viterbi(ld[b], lp, lt))


def test_strong_diagonal_stays():
    # with huge self-transition, path should stay at the prior-best state
    S, N = 5, 30
    ld = np.zeros((S, N))
    lp = np.array([0.0, 5.0, 0.0, 0.0, 0.0])
    lt = np.full((S, S), -100.0)
    np.fill_diagonal(lt, 0.0)
    got = np.asarray(viterbi_track(jnp.asarray(ld), jnp.asarray(lp), jnp.asarray(lt)))
    assert (got == 1).all()
