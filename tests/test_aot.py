"""AOT serving bundles (rerevst_tpu/io/aot.py): export the compiled Pass-2
hot path via jax.export, reload it, and check it is bit-identical to the
jit path — the deployment-artifact capability the reference lacks entirely
(its inference re-builds the net from source + torch.load,
``test/framework.py:57-78``)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def session():
    from rerevst_tpu.api import Stylization
    from rerevst_tpu.config import ModelConfig

    sess = Stylization(
        checkpoint=os.path.join(os.path.dirname(__file__), "..",
                                "models", "demo_plum_4000.msgpack"),
        cfg=ModelConfig(dtype=jnp.float32), use_global=True)
    cv2 = pytest.importorskip("cv2")
    frame = cv2.imread(
        "/root/reference/test/inputs/ambush_4/frame_0001.png")
    style = cv2.imread("/root/reference/test/inputs/plum_flower.jpg")
    sess.prepare_style(style)
    sess.clean()
    sess.add(frame[:64, :64])
    sess.compute()
    return sess, frame


def test_bundle_roundtrip_matches_jit(session, tmp_path):
    from rerevst_tpu.data.transforms import bgr_to_model
    from rerevst_tpu.io.aot import load_bundle, save_bundle

    sess, frame = session
    path = str(tmp_path / "pass2.rvaot")
    meta = save_bundle(path, sess, (64, 64), batches=(1, 2),
                       platforms=("cpu", "tpu"))
    assert meta["hw"] == [64, 64] and meta["batches"] == [1, 2]
    assert os.path.getsize(path) > len(b"RVAOT001")

    aot = load_bundle(path)
    assert aot.batches() == [1, 2]
    x1 = jnp.asarray(bgr_to_model(frame[:64, :64]))
    x2 = jnp.concatenate([x1, jnp.asarray(bgr_to_model(frame[64:128, :64]))])
    for x in (x1, x2):
        want = np.asarray(sess._stylize(x))
        got = np.asarray(aot(sess.params, x, sess.style, sess.stats))
        np.testing.assert_array_equal(want, got)

    # The bundle was built with the REAL style loaded; its relu4_1 map dims
    # are exported symbolically, so a different-geometry style must work.
    st2 = sess._encode_style(
        sess.params, jnp.asarray(bgr_to_model(frame[:96, :128])))
    y = aot(sess.params, x1, st2, sess.stats)
    assert y.shape == x1.shape

    # Shapes outside the bundle raise KeyError (session falls back to jit).
    with pytest.raises(KeyError):
        aot(sess.params, jnp.concatenate([x1] * 3), sess.style, sess.stats)
    with pytest.raises(KeyError):
        aot(sess.params, jnp.zeros((1, 128, 64, 3), jnp.float32),
            sess.style, sess.stats)


def test_session_aot_path_and_fallback(session, tmp_path):
    from rerevst_tpu.data.transforms import bgr_to_model
    from rerevst_tpu.io.aot import save_bundle

    sess, frame = session
    path = str(tmp_path / "pass2.rvaot")
    save_bundle(path, sess, (64, 64), batches=(1,), platforms=("cpu",))

    x1 = jnp.asarray(bgr_to_model(frame[:64, :64]))
    want = np.asarray(sess._stylize(x1))
    sess.use_aot(path)
    try:
        got = np.asarray(sess._stylize(x1))
        np.testing.assert_array_equal(want, got)
        # batch 3 is not in the bundle: jit fallback must serve it.
        y3 = sess._stylize(jnp.concatenate([x1] * 3))
        assert y3.shape == (3, 64, 64, 3)
    finally:
        sess._aot = None


def test_convert_cli_export_aot(tmp_path):
    from rerevst_tpu import convert
    from rerevst_tpu.io.aot import load_bundle

    ckpt = os.path.join(os.path.dirname(__file__), "..",
                        "models", "demo_plum_4000.msgpack")
    out = str(tmp_path / "cli.rvaot")
    convert.main([ckpt, out, "--export-aot", "--hw", "64x64",
                  "--batches", "1,2", "--dtype", "f32",
                  "--platforms", "cpu"])
    aot = load_bundle(out)
    assert aot.hw == (64, 64) and aot.batches() == [1, 2]
    assert aot.meta["platforms"] == ["cpu"]


def test_aot_falls_back_on_stats_structure_drift(session, tmp_path):
    """jax.export rejects aval drift with ValueError (e.g. a Pass-1 rerun
    whose stats dtypes differ from export time); the session must fall back
    to the jit path — serving keeps working — and warn once."""
    from rerevst_tpu.data.transforms import bgr_to_model
    from rerevst_tpu.io.aot import save_bundle

    sess, frame = session
    path = str(tmp_path / "pass2.rvaot")
    save_bundle(path, sess, (64, 64), batches=(1,), platforms=("cpu",))
    x1 = jnp.asarray(bgr_to_model(frame[:64, :64]))
    want = np.asarray(sess._stylize(x1))
    orig_stats = sess.stats
    sess.use_aot(path)
    try:
        sess.stats = sess.stats._replace(
            filters={k: v.astype(jnp.bfloat16)
                     for k, v in sess.stats.filters.items()})
        out = np.asarray(sess._stylize(x1))  # ValueError inside -> jit
        assert sess._aot_warned, "fallback should warn"
        assert sess._aot is None, ("a permanently-rejected bundle must be "
                                   "dropped, not re-attempted per frame")
        assert out.shape == want.shape
    finally:
        sess.stats = orig_stats
        sess._aot = None


def test_use_aot_rejects_dtype_mismatch(session, tmp_path):
    """A bundle is dtype-specialized; loading it into a session with a
    different storage dtype must fail loudly at load time, not 500 on
    every request (the exported avals would reject every call)."""
    from rerevst_tpu.api import Stylization
    from rerevst_tpu.config import ModelConfig
    from rerevst_tpu.io.aot import save_bundle

    sess, _ = session
    path = str(tmp_path / "f32.rvaot")
    save_bundle(path, sess, (64, 64), batches=(1,), platforms=("cpu",))

    other = Stylization(params=sess.params,
                        cfg=ModelConfig(dtype=jnp.bfloat16), use_global=True)
    with pytest.raises(ValueError, match="exported for dtype"):
        other.use_aot(path)


def test_load_bundle_rejects_garbage(tmp_path):
    from rerevst_tpu.io.aot import load_bundle

    p = tmp_path / "junk.rvaot"
    p.write_bytes(b"NOTABUNDLE")
    with pytest.raises(ValueError, match="not an AOT bundle"):
        load_bundle(str(p))
