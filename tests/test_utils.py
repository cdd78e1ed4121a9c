"""Runtime-services tests: params registry, stats, log, graph dump, png."""

import numpy as np
import pytest

from zetaray_tpu.utils.params import ParamRegistry, Param
from zetaray_tpu.utils.stats import FrameStats, KernelTimer
from zetaray_tpu.utils import log as zlog
from zetaray_tpu.utils.png import write_png, read_png


def test_param_registry_roundtrip():
    reg = ParamRegistry()
    seen = []
    reg.add(Param("Sun", "Dir", "dir", "unitdir", (0, 1, 0), on_change=seen.append))
    reg.add(Param("PT", "Path", "bounces", "int", 4, min=0, max=8))
    reg.set("Sun/Dir/dir", (2.0, 0.0, 0.0))
    assert seen == [(1.0, 0.0, 0.0)]  # normalized
    reg.set("PT/Path/bounces", 99)
    assert reg.get("PT/Path/bounces").value == 8  # clamped
    snap = reg.snapshot()
    reg.set("PT/Path/bounces", 2)
    reg.restore(snap)
    assert reg.get("PT/Path/bounces").value == 8
    with pytest.raises(ValueError):
        reg.add(Param("A", "B", "e", "enum", "x", choices=("x", "y")))
        reg.set("A/B/e", "zzz")


def test_param_pending_applied_at_frame_boundary():
    reg = ParamRegistry()
    reg.add(Param("G", "S", "v", "float", 1.0))
    reg.queue_set("G/S/v", 2.5)
    assert reg.get("G/S/v").value == 1.0
    assert reg.apply_pending() == 1
    assert reg.get("G/S/v").value == 2.5


def test_frame_stats():
    st = FrameStats()
    for i in range(3):
        st.begin_frame()
        st.add("gpu", "rays", 100 + i)
        dt = st.end_frame()
        assert dt >= 0
    assert st.frame_index == 3
    assert "gpu/rays: 102" in st.report()
    kt = KernelTimer()
    with kt.span("pass"):
        pass
    assert "pass" in kt.report()


def test_log_ring():
    zlog.set_mirror(False)
    zlog.info("hello")
    zlog.warning("careful")
    entries = zlog.ring()
    assert entries[-1][1] == "WARNING" and entries[-1][2] == "careful"
    zlog.set_mirror(True)


def test_frame_dag_dot():
    from zetaray_tpu.render.graph import frame_dag
    from zetaray_tpu.render import RenderConfig

    dot = frame_dag(RenderConfig(mode="restir_di", denoise=True))
    assert "digraph" in dot and "restir_spatial" in dot and "atrous" in dot
    dot2 = frame_dag(RenderConfig(mode="pt"))
    assert "pt(megakernel)" in dot2 and "restir" not in dot2


def test_png_roundtrip(tmp_path):
    img = (np.random.default_rng(0).random((16, 24, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_validate_detects_nan_and_negative():
    """utils.validate: the Check/debug-layer analog flags NaN/Inf/negative
    planes by name (SURVEY.md section 5 failure detection)."""
    import jax.numpy as jnp
    import pytest as _pytest

    from zetaray_tpu.utils.validate import (
        ValidationError, check_finite, check_frame,
    )

    good = jnp.ones((3, 8, 8))
    assert check_finite("ok", good)
    bad = good.at[0, 2, 3].set(jnp.nan)
    with _pytest.raises(ValidationError, match="'hdr' has 1 NaN"):
        check_frame({"hdr": bad})
    neg = good.at[1, 0, 0].set(-1.0)
    with _pytest.raises(ValidationError, match="negative"):
        check_finite("hdr", neg, allow_negative=False)
    assert check_finite("neg-ok", neg)  # negatives fine for reservoirs
    assert not check_finite("soft", bad, raise_on_error=False)
    # integer arrays (ldr u8) pass through
    assert check_finite("ldr", jnp.zeros((4, 4), jnp.uint8))
