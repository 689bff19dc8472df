"""Config loader tests (SURVEY.md §2.10 — RootPureConfig parity)."""

from __future__ import annotations

import pytest

from scio_db_spark.config import (
    ConfigEnv,
    ConfigError,
    ConfigSource,
    RootConfig,
    parse_hocon,
    read_config,
    read_config_with_override,
)

HOCON = """
// comment
local {
  gcs-bucket = "b1" // trailing comment
  mediation {
    version = "1.2.3"
    config-path = "mediation/"${local.mediation.version}"/app.conf"
    ttl-time = 120
    retry-notifications = true
    endpoint {
      url = host.example
      full-url = "https://"${local.mediation.endpoint.url}
    }
  }
}
prod {
  gcs-bucket = "b2"
  mediation { ttl-time = 259200 }
}
"""


def test_parse_hocon_subset():
    t = parse_hocon(HOCON)
    med = t["local"]["mediation"]
    assert t["local"]["gcs-bucket"] == "b1"
    assert med["ttl-time"] == 120
    assert med["retry-notifications"] is True
    # ${} substitution + adjacent-string concatenation.
    assert med["config-path"] == "mediation/1.2.3/app.conf"
    assert med["endpoint"]["full-url"] == "https://host.example"
    assert t["prod"]["mediation"]["ttl-time"] == 259200
    # Quoted scalars are never type-coerced; bare ones are.
    t2 = parse_hocon('a { q = "123"\n b = 123\n f = "true"\n g = true }')
    assert t2["a"]["q"] == "123" and t2["a"]["b"] == 123
    assert t2["a"]["f"] == "true" and t2["a"]["g"] is True


def test_env_roots_and_typed_tree():
    cfg = read_config(ConfigEnv.local, ConfigSource.STRING, HOCON)
    assert cfg.gcs_bucket == "b1"
    assert cfg.mediation.ttl_time == 120
    assert cfg.mediation.endpoint.full_url == "https://host.example"
    prod = read_config("prod", ConfigSource.STRING, HOCON)
    assert prod.mediation.ttl_time == 259200


def test_unknown_env_and_missing_root():
    with pytest.raises(ConfigError, match="unknown config env"):
        read_config("staging", ConfigSource.STRING, HOCON)
    with pytest.raises(ConfigError, match="no 'uat' root"):
        read_config("uat", ConfigSource.STRING, HOCON)


def test_default_resource_loads_all_envs():
    for env in (ConfigEnv.local, ConfigEnv.test, ConfigEnv.prod):
        cfg = read_config(env)
        assert isinstance(cfg, RootConfig)
        assert cfg.mediation.endpoint.full_url.startswith("http")
    assert read_config(ConfigEnv.prod).mediation.ttl_time == 259200


def test_override_string_beats_default():
    cfg = read_config_with_override(ConfigEnv.local, HOCON)
    assert cfg.gcs_bucket == "b1"
    fallback = read_config_with_override(ConfigEnv.local, None)
    assert fallback.gcs_bucket == "local_bucket"


def test_env_var_source(monkeypatch):
    monkeypatch.setenv("LOCAL__GCS_BUCKET", "envbucket")
    monkeypatch.setenv("LOCAL__MEDIATION__TTL_TIME", "42")
    cfg = read_config(ConfigEnv.local, ConfigSource.ENV)
    assert cfg.gcs_bucket == "envbucket"
    assert cfg.mediation.ttl_time == 42


def test_duplicate_key_object_merge_is_recursive():
    """HOCON: re-opening a block merges field-wise at every depth; the
    override use case must not wipe sibling nested objects."""
    from scio_db_spark.config import parse_hocon

    text = (
        'prod { mediation { endpoint { url = "a"\n username = "u" } } }\n'
        "prod { mediation { ttl-time = 5 } }"
    )
    cfg = parse_hocon(text)
    assert cfg["prod"]["mediation"]["endpoint"]["url"] == "a"
    assert cfg["prod"]["mediation"]["endpoint"]["username"] == "u"
    assert cfg["prod"]["mediation"]["ttl-time"] == 5


def test_commas_separate_elements():
    """Comma = newline in HOCON; it must not corrupt scalars or reject
    inline objects."""
    from scio_db_spark.config import parse_hocon

    assert parse_hocon("a = 1,\nb = 2") == {"a": 1, "b": 2}
    assert parse_hocon("x { a = 1, b = 2 }") == {"x": {"a": 1, "b": 2}}


def test_hocon_arrays_rejected_loudly():
    import pytest as _pytest

    from scio_db_spark.config import ConfigError, parse_hocon

    with _pytest.raises(ConfigError, match="arrays"):
        parse_hocon('a = [1, 2, 3]')


def test_quoted_string_standard_escapes():
    from scio_db_spark.config import parse_hocon

    t = parse_hocon('p = "a\\nb"\nq = "back\\\\slash"\nr = "say \\"hi\\""')
    assert t["p"] == "a\nb"
    assert t["q"] == "back\\slash"
    assert t["r"] == 'say "hi"'


def test_env_prefix_conflict_raises_config_error(monkeypatch):
    import pytest as _pytest

    from scio_db_spark.config import (
        ConfigError,
        ConfigSource,
        read_config,
    )

    monkeypatch.setenv("PROD__MEDIATION", "x")
    monkeypatch.setenv("PROD__MEDIATION__TTL_TIME", "300")
    with _pytest.raises(ConfigError, match="env var"):
        read_config("prod", source=ConfigSource.ENV)
