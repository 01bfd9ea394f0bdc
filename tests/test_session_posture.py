"""Partition-planning posture selection (session.py).

The posture itself is exercised end-to-end by the deep-scale harness
(scripts/scaling_bench.py runs with ``wide_shuffles=True``); these tests
pin the SELECTION logic — which deployments get wide planning — since a
wrong default either re-introduces the 64x shuffled-hash-build cliff
(cluster planned fixed-width) or taxes every local iterative loop
(local planned wide).
"""

from cherry_pipelines_spark.session import _wide_default


def test_local_master_defaults_to_fixed_width(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_WIDE_SHUFFLES", raising=False)
    assert _wide_default("local[32]") is False
    assert _wide_default("local[*]") is False


def test_cluster_masters_default_to_wide(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_WIDE_SHUFFLES", raising=False)
    assert _wide_default("yarn") is True
    assert _wide_default("k8s://https://host:443") is True
    assert _wide_default("spark://host:7077") is True


def test_env_forces_wide_locally(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_WIDE_SHUFFLES", "1")
    assert _wide_default("local[32]") is True


def test_empty_env_value_is_not_a_force(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_WIDE_SHUFFLES", "")
    assert _wide_default("local[32]") is False


def test_falsey_env_values_disable(monkeypatch):
    """'0'/'false'/'no' must NOT force wide — a user exporting
    SPARK_GRAFT_WIDE_SHUFFLES=0 to disable it should get fixed-width
    (round-8 advice: bool(getenv(...)) treated '0' as a force)."""
    for v in ("0", "false", "FALSE", "no", " 0 "):
        monkeypatch.setenv("SPARK_GRAFT_WIDE_SHUFFLES", v)
        assert _wide_default("local[32]") is False, v
    for v in ("1", "true", "yes", "on"):
        monkeypatch.setenv("SPARK_GRAFT_WIDE_SHUFFLES", v)
        assert _wide_default("local[32]") is True, v


def test_local_cluster_master_gets_wide_posture(monkeypatch):
    """local-cluster[n,c,m] simulates a multi-JVM cluster — it must get
    the cluster posture, not be string-prefix-matched as local."""
    monkeypatch.delenv("SPARK_GRAFT_WIDE_SHUFFLES", raising=False)
    assert _wide_default("local-cluster[2,1,1024]") is True
    assert _wide_default("local") is False


def test_wide_session_confs(tmp_path):
    """The wide posture must land BOTH confs on a real session: wide
    initial planning without cached-plan repartitioning re-pins the
    full width inside every iterative loop's cache.  Needs its own JVM
    (the suite session is already built, fixed-width), so drive a
    subprocess."""
    import subprocess
    import sys

    code = (
        "from cherry_pipelines_spark.session import get_spark\n"
        "s = get_spark('posture_probe', shuffle_partitions=2,"
        " wide_shuffles=True)\n"
        "assert s.conf.get("
        "'spark.sql.adaptive.coalescePartitions.initialPartitionNum'"
        ") == '64'\n"
        "assert s.conf.get("
        "'spark.sql.optimizer.canChangeCachedPlanOutputPartitioning'"
        ") == 'true'\n"
        "print('POSTURE_OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        env={
            **__import__("os").environ,
            "SPARK_GRAFT_CPUS": "2",
        },
    )
    assert "POSTURE_OK" in r.stdout, r.stderr[-2000:]
