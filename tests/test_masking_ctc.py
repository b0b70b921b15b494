"""CTC loss vs brute-force DP; label smoothing, sos/eos, greedy decode."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from syncvsr_tpu.ops.ctc import ctc_greedy_decode, ctc_loss
from syncvsr_tpu.ops.masking import (
    add_sos_eos,
    decoder_accuracy,
    label_smoothing_kl,
    length_mask,
)


def brute_force_ctc_nll(log_probs, label, blank=0):
    """Sum probability over all alignments by enumeration (tiny T only)."""
    t, v = log_probs.shape
    total = 0.0
    for path in itertools.product(range(v), repeat=t):
        # collapse path
        collapsed = []
        prev = None
        for s in path:
            if s != blank and s != prev:
                collapsed.append(s)
            prev = s
        if collapsed == list(label):
            total += np.exp(sum(log_probs[i, s] for i, s in enumerate(path)))
    return -np.log(total)


def test_ctc_matches_brute_force():
    rng = np.random.RandomState(0)
    t, v = 4, 3
    logits = rng.randn(1, t, v).astype(np.float32)
    label = [1, 2]
    loss = ctc_loss(jnp.asarray(logits), jnp.asarray([t]),
                    jnp.asarray([label]), jnp.asarray([2]))
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0]), axis=-1))
    expected = brute_force_ctc_nll(log_probs, label)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_ctc_respects_lengths():
    rng = np.random.RandomState(1)
    logits = rng.randn(1, 6, 4).astype(np.float32)
    # padding frames beyond length 4 must not change the loss
    l1 = ctc_loss(jnp.asarray(logits), jnp.asarray([4]),
                  jnp.asarray([[1, 2, -1]]), jnp.asarray([2]))
    logits2 = logits.copy()
    logits2[0, 4:] = 123.0
    l2 = ctc_loss(jnp.asarray(logits2), jnp.asarray([4]),
                  jnp.asarray([[1, 2, -1]]), jnp.asarray([2]))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_greedy_decode_collapse():
    # path: [1 1 0 2 2 0 1] -> [1, 2, 1]
    v = 4
    path = np.array([1, 1, 0, 2, 2, 0, 1])
    logits = np.full((1, len(path), v), -10.0, np.float32)
    logits[0, np.arange(len(path)), path] = 10.0
    toks, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([len(path)]))
    assert int(lens[0]) == 3
    assert np.asarray(toks)[0, :3].tolist() == [1, 2, 1]
    assert (np.asarray(toks)[0, 3:] == -1).all()


def test_add_sos_eos():
    labels = jnp.asarray([[3, 4, -1, -1], [5, 6, 7, 8]])
    ys_in, ys_out, lens = add_sos_eos(labels, sos=9, eos=9, ignore_id=-1)
    assert ys_in.shape == (2, 5) and ys_out.shape == (2, 5)
    assert np.asarray(ys_in)[0].tolist() == [9, 3, 4, 9, 9]
    assert np.asarray(ys_out)[0].tolist() == [3, 4, 9, -1, -1]
    assert np.asarray(ys_in)[1].tolist() == [9, 5, 6, 7, 8]
    assert np.asarray(ys_out)[1].tolist() == [5, 6, 7, 8, 9]
    assert np.asarray(lens).tolist() == [3, 5]


def test_label_smoothing_matches_direct():
    rng = np.random.RandomState(2)
    b, l, v = 2, 3, 5
    logits = jnp.asarray(rng.randn(b, l, v), jnp.float32)
    targets = jnp.asarray([[1, 2, -1], [3, 0, 4]])
    smoothing = 0.1
    got = label_smoothing_kl(logits, targets, v, smoothing)

    # direct KL computation
    conf, low = 1 - smoothing, smoothing / (v - 1)
    logq = np.asarray(jax.nn.log_softmax(logits, -1)).reshape(-1, v)
    t = np.asarray(targets).reshape(-1)
    total = 0.0
    for i, ti in enumerate(t):
        if ti == -1:
            continue
        p = np.full(v, low)
        p[ti] = conf
        total += float((p * (np.log(p) - logq[i])).sum())
    np.testing.assert_allclose(float(got), total / b, rtol=1e-5)

    # smoothing=0 reduces to CE/batch
    got0 = label_smoothing_kl(logits, targets, v, 0.0)
    ce = 0.0
    for i, ti in enumerate(t):
        if ti != -1:
            ce += -logq[i, ti]
    np.testing.assert_allclose(float(got0), ce / b, rtol=1e-5)


def test_label_smoothing_v2_matches_v1():
    """SYNCVSR_LSM_V2 (reassociated, no log_softmax materialization) must be
    numerically identical to the logq form — value AND gradient — across the
    weighting paths."""
    import os

    rng = np.random.RandomState(7)
    b, l, v = 3, 5, 37
    logits = jnp.asarray(rng.randn(b, l, v).astype(np.float32) * 4)
    targets = jnp.asarray(rng.randint(-1, v, (b, l)))
    w = jnp.asarray([1.0, 0.0, 1.0])

    cases = [
        dict(smoothing=0.1),
        dict(smoothing=0.0),
        dict(smoothing=0.1, normalize_length=True),
        dict(smoothing=0.1, sample_weight=w),
        dict(smoothing=0.1, normalize_length=True, sample_weight=w),
    ]
    assert "SYNCVSR_LSM_V2" not in os.environ
    for kw in cases:
        f = lambda lg: label_smoothing_kl(lg, targets, v, **kw)
        v1, g1 = jax.value_and_grad(f)(logits)
        os.environ["SYNCVSR_LSM_V2"] = "1"
        try:
            v2, g2 = jax.value_and_grad(f)(logits)
        finally:
            del os.environ["SYNCVSR_LSM_V2"]
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)


def test_decoder_accuracy():
    logits = jnp.asarray(np.eye(4)[None, [1, 2, 3]], jnp.float32)  # predicts 1,2,3
    targets = jnp.asarray([[1, 2, -1]])
    acc = decoder_accuracy(logits, targets)
    np.testing.assert_allclose(float(acc), 1.0)


def test_length_mask():
    m = length_mask(jnp.asarray([2, 0, 3]), 3)
    assert np.asarray(m).tolist() == [[True, True, False],
                                      [False, False, False],
                                      [True, True, True]]


# ---------------------------------------------------------------------------
# forced alignment (reference espnet ctc.py:181-245 forced_align)
# ---------------------------------------------------------------------------

def _np_forced_align(lp, y, blank=0):
    """Independent per-utterance numpy Viterbi over the CTC trellis (written
    fresh from the lattice definition; same tie-breaking order as the op:
    stay < advance1 < advance2, terminal last-blank preferred on ties)."""
    y_int = [blank]
    for l in y:
        y_int += [int(l), blank]
    S, T = len(y_int), lp.shape[0]
    delta = np.full((T, S), -np.inf)
    psi = np.zeros((T, S), int)
    delta[0, 0] = lp[0, y_int[0]]
    if S > 1:
        delta[0, 1] = lp[0, y_int[1]]
    for t in range(1, T):
        for s in range(S):
            cands, offs = [delta[t - 1, s]], [0]
            if s >= 1:
                cands.append(delta[t - 1, s - 1])
                offs.append(1)
            if s >= 2 and y_int[s] != blank and y_int[s] != y_int[s - 2]:
                cands.append(delta[t - 1, s - 2])
                offs.append(2)
            k = int(np.argmax(cands))
            delta[t, s] = cands[k] + lp[t, y_int[s]]
            psi[t, s] = s - offs[k]
    s = S - 1 if S == 1 or delta[T - 1, S - 1] >= delta[T - 1, S - 2] \
        else S - 2
    states = [s]
    for t in range(T - 1, 0, -1):
        s = psi[t, s]
        states.append(s)
    states.reverse()
    return [y_int[st] for st in states]


def test_forced_align_matches_numpy_viterbi():
    from syncvsr_tpu.ops.ctc import ctc_forced_align

    rng = np.random.RandomState(0)
    b, t, v, n = 5, 12, 7, 4
    logits = rng.randn(b, t, v).astype(np.float32) * 2.0
    tl = np.array([12, 9, 12, 7, 12])
    ll = np.array([4, 3, 1, 2, 0])
    labels = rng.randint(1, v, (b, n))
    labels[1, 2] = labels[1, 1]  # repeated label: exercises the skip rule

    got = np.asarray(ctc_forced_align(
        jnp.asarray(logits), jnp.asarray(tl), jnp.asarray(labels),
        jnp.asarray(ll)))
    for i in range(b):
        lp = jax.nn.log_softmax(jnp.asarray(logits[i, :tl[i]])).__array__()
        want = _np_forced_align(lp, labels[i, :ll[i]])
        assert got[i, :tl[i]].tolist() == want, f"row {i}"
        assert (got[i, tl[i]:] == -1).all()


def test_forced_align_collapses_to_transcript():
    """The alignment must be a valid CTC path: collapsing repeats + blanks
    reproduces the transcript exactly, for every row of a random batch."""
    from syncvsr_tpu.ops.ctc import ctc_forced_align

    rng = np.random.RandomState(7)
    b, t, v, n = 8, 20, 9, 6
    logits = rng.randn(b, t, v).astype(np.float32)
    tl = rng.randint(2 * n + 1, t + 1, b)
    ll = rng.randint(0, n + 1, b)
    labels = rng.randint(1, v, (b, n))

    got = np.asarray(ctc_forced_align(
        jnp.asarray(logits), jnp.asarray(tl), jnp.asarray(labels),
        jnp.asarray(ll)))
    for i in range(b):
        path = got[i, :tl[i]]
        collapsed = []
        prev = 0
        for s in path:
            if s != 0 and s != prev:
                collapsed.append(int(s))
            prev = s
        assert collapsed == labels[i, :ll[i]].tolist(), f"row {i}"


def test_forced_align_is_max_probability_path():
    """Exhaustive check at tiny size: among ALL monotone blank-interleaved
    state paths consistent with the transcript, the op returns one with the
    maximum total log-probability."""
    from syncvsr_tpu.ops.ctc import ctc_forced_align

    rng = np.random.RandomState(3)
    t, v = 6, 5
    labels = [2, 4]
    logits = rng.randn(1, t, v).astype(np.float32) * 1.5
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0])))
    y_int = [0, 2, 0, 4, 0]

    def paths(s, seq):
        if len(seq) == t:
            if s >= len(y_int) - 2:
                yield list(seq)
            return
        for ds in (0, 1, 2):
            ns = s + ds
            if ns >= len(y_int):
                continue
            if ds == 2 and (y_int[ns] == 0 or y_int[ns] == y_int[ns - 2]):
                continue
            seq.append(ns)
            yield from paths(ns, seq)
            seq.pop()

    best = -np.inf
    for start in (0, 1):
        for p in paths(start, [start]):
            score = sum(lp[i, y_int[s]] for i, s in enumerate(p))
            best = max(best, score)

    got = np.asarray(ctc_forced_align(
        jnp.asarray(logits), jnp.asarray([t]),
        jnp.asarray([labels]), jnp.asarray([2])))[0]
    got_score = sum(lp[i, tok] if tok == 0 else lp[i, tok]
                    for i, tok in enumerate(got))
    np.testing.assert_allclose(got_score, best, rtol=1e-5)
