"""UPP_SCAN_UNROLL resolution (VERDICT r4 item 7): env overrides config,
unset falls through, non-integer values error loudly."""

import pytest

from upp_tpu.models.scan_blocks import _effective_unroll


def test_unset_falls_through_to_module(monkeypatch):
    monkeypatch.delenv("UPP_SCAN_UNROLL", raising=False)
    assert _effective_unroll(4, 12) == 4
    assert _effective_unroll(None, 12) == 12   # None = full unroll


def test_env_overrides_module(monkeypatch):
    monkeypatch.setenv("UPP_SCAN_UNROLL", "2")
    assert _effective_unroll(4, 12) == 2
    assert _effective_unroll(None, 12) == 2


def test_empty_env_is_unset(monkeypatch):
    monkeypatch.setenv("UPP_SCAN_UNROLL", "")
    assert _effective_unroll(4, 12) == 4


def test_non_integer_env_errors_loudly(monkeypatch):
    monkeypatch.setenv("UPP_SCAN_UNROLL", "full")
    with pytest.raises(ValueError, match="UPP_SCAN_UNROLL"):
        _effective_unroll(4, 12)
