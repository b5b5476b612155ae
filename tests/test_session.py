"""Session factory guards: static conf that cannot be applied at
runtime must be loudly diagnosed on borrowed sessions."""

from __future__ import annotations

import warnings

import pytest

from pride_spark import session as S


class _FakeConf:
    def __init__(self, values):
        self._v = dict(values)

    def set(self, k, v):
        self._v[k] = v

    def get(self, k, default=None):
        return self._v.get(k, default)


class _FakeSession:
    """Just enough surface for tune(): a .conf with get/set."""

    def __init__(self, values):
        self.conf = _FakeConf(values)


def test_tune_warns_on_borrowed_session_with_default_codegen_cache():
    """r12 verdict watch item: spark.sql.codegen.cache.maxEntries is
    applied only at session build; a borrowed session silently keeps the
    100-entry default (the key is not runtime-settable) and the bench
    numbers regress with no code change.  tune() must read the live
    value back and warn, naming the consequence."""
    borrowed = _FakeSession({"spark.sql.codegen.cache.maxEntries": "100"})
    with pytest.warns(RuntimeWarning, match="codegen"):
        S.tune(borrowed)
    # and the runtime keys were still applied despite the warning
    assert borrowed.conf.get("spark.sql.session.timeZone") == "UTC"


def test_tune_is_silent_when_static_conf_matches(spark):
    """The package's own session carries STATIC_CONF, so tune() on it
    must not warn — the guard fires only on genuine drift."""
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        S.tune(spark)
    assert (
        spark.conf.get("spark.sql.codegen.cache.maxEntries")
        == S.STATIC_CONF["spark.sql.codegen.cache.maxEntries"]
    )
