"""seekr_tpu_doctor health report (utils/doctor.py)."""

import io
import subprocess

import pytest

from seekr_tpu.utils import doctor


def test_host_checks_pass(capsys):
    healthy = doctor.run_doctor(skip_device=True)
    out = capsys.readouterr().out
    assert healthy is True
    assert "[ok  ] python" in out
    assert "jax" in out and "native" in out and "aot-store" in out
    assert "all checks passed" in out


def test_device_probe_hang_is_reported_not_hung(monkeypatch):
    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=kw["timeout"])

    monkeypatch.setattr(doctor.subprocess, "run", fake_run)
    status, name, detail = doctor._device_probe(1.0)
    assert status == doctor.FAIL and "hung" in detail


def test_device_probe_parses_healthy_output(monkeypatch):
    class P:
        returncode = 0
        stdout = "tpu|1|TPU v5 lite|8.0\n"
        stderr = ""

    monkeypatch.setattr(doctor.subprocess, "run", lambda *a, **kw: P())
    status, _, detail = doctor._device_probe(1.0)
    assert status == doctor.OK
    assert "backend=tpu" in detail and "correct" in detail


def test_device_probe_flags_wrong_math(monkeypatch):
    class P:
        returncode = 0
        stdout = "tpu|1|TPU v5 lite|7.5\n"
        stderr = ""

    monkeypatch.setattr(doctor.subprocess, "run", lambda *a, **kw: P())
    status, _, detail = doctor._device_probe(1.0)
    assert status == doctor.FAIL and "WRONG" in detail


def test_env_overrides_surface_as_warnings(monkeypatch, capsys):
    monkeypatch.setenv("SEEKR_TPU_COUNT_IMPL", "xla")
    doctor.run_doctor(skip_device=True)
    out = capsys.readouterr().out
    assert "SEEKR_TPU_COUNT_IMPL=xla (non-default)" in out


def test_aot_store_reports_contents(monkeypatch, tmp_path):
    (tmp_path / "a.pkl").write_bytes(b"x" * 1000)
    monkeypatch.setenv("SEEKR_TPU_AOT", str(tmp_path))
    status, _, detail = doctor._aot_store()
    assert status == doctor.OK and "1 executables" in detail


def test_cli_doctor_runs_bare(monkeypatch, capsys):
    # bare invocation RUNS (host-only here) instead of printing help
    from seekr_tpu import cli

    monkeypatch.setattr("sys.argv", ["seekr_tpu_doctor", "--no-device"])
    with pytest.raises(SystemExit) as e:
        cli.console_doctor()
    assert e.value.code == 0
    assert "all checks passed" in capsys.readouterr().out


def test_cli_doctor_in_manual():
    from seekr_tpu import cli

    parser = cli._collect_parser(cli.console_doctor)
    flags = {o for a in parser._actions for o in a.option_strings}
    assert "--no-device" in flags and "--device-timeout" in flags
