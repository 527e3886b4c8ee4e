"""colog-style CLI logging (utils/logcolor.py) — the reference's colored
level markers plus cyan/yellow argument highlighting
(src/lib.rs:392-413 colog_info!/colog_warn!)."""

import io
import logging

import pytest

from gorder_tpu.utils.logcolor import (CYAN, RESET, YELLOW, CologFormatter,
                                       colors_enabled, install_cli_logging)


def _fmt(color, level, msg, *args):
    rec = logging.LogRecord("gorder", level, __file__, 1, msg, args, None)
    return CologFormatter(color).format(rec)


def test_info_args_cyan():
    out = _fmt(True, logging.INFO, "wire format: %s — %d atoms", "b7", 19456)
    assert f"{CYAN}b7{RESET}" in out
    assert f"{CYAN}19456{RESET}" in out
    assert out.startswith("\x1b[32m\x1b[1m[*]\x1b[0m ")


def test_warn_args_yellow():
    out = _fmt(True, logging.WARNING, "batch %d exceeds", 7)
    assert f"{YELLOW}7{RESET}" in out
    assert "[!]" in out


def test_numeric_directives_render_through_color():
    out = _fmt(True, logging.INFO, "%.1f KB/frame", 53.44)
    assert f"{CYAN}53.4{RESET}" in out


def test_literal_percent_not_consumed():
    out = _fmt(True, logging.INFO, "at 100%% of %s", "ceiling")
    assert "at 100% of" in out
    assert f"{CYAN}ceiling{RESET}" in out


def test_no_color_mode_is_plain():
    out = _fmt(False, logging.INFO, "wire format: %s", "b7")
    assert out == "[*] wire format: b7"
    assert "\x1b[" not in out


def test_error_marker():
    out = _fmt(False, logging.ERROR, "boom")
    assert out == "[E] boom"


def test_mismatched_args_fall_back_to_plain():
    # %s consumed by a tuple longer than the directives — must not raise
    rec = logging.LogRecord("gorder", logging.INFO, __file__, 1,
                            "only %s here", ("a", "b"), None)
    out = CologFormatter(True).format(rec)
    assert "only" in out  # rendered via the stdlib fallback


def test_colors_env_gates(monkeypatch):
    stream = io.StringIO()  # not a tty
    monkeypatch.delenv("NO_COLOR", raising=False)
    monkeypatch.delenv("GORDER_TPU_COLOR", raising=False)
    assert not colors_enabled(stream)
    monkeypatch.setenv("GORDER_TPU_COLOR", "1")
    assert colors_enabled(stream)
    monkeypatch.setenv("GORDER_TPU_COLOR", "0")
    assert not colors_enabled(stream)
    monkeypatch.delenv("GORDER_TPU_COLOR", raising=False)
    monkeypatch.setenv("NO_COLOR", "1")
    assert not colors_enabled(stream)


def test_install_cli_logging_routes_and_silences(monkeypatch):
    stream = io.StringIO()
    monkeypatch.setenv("GORDER_TPU_COLOR", "1")
    install_cli_logging(silent=False, stream=stream)
    log = logging.getLogger("gorder")
    log.info("picked %s", "b7")
    assert f"{CYAN}b7{RESET}" in stream.getvalue()

    stream2 = io.StringIO()
    install_cli_logging(silent=True, stream=stream2)
    log.info("hidden")
    log.error("shown %s", "loud")
    assert "hidden" not in stream2.getvalue()
    assert "shown loud" in stream2.getvalue()
    # restore a plain config for the rest of the suite
    logging.getLogger().handlers[:] = []
