"""eval_flagship --resume must skip every already-committed section.

Round-5 lesson: VM resets kill TPU evals mid-run; the flagship artifact is
rebuilt across sessions, and re-paying the denoise-sanity compiles (~10 min
of one-shot-denoise graphs at three sigmas) on every retry ate whole TPU
windows. With --resume, sections already present in summary.json are reused
verbatim and — crucially — a fully-resumed invocation must not even load the
trained checkpoints (TPU-saved Orbax dirs do not restore on the CPU host).
"""

import json
import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_resume_skips_all_completed_sections(tmp_path, monkeypatch):
    ef = _load("eval_flagship")
    if not (os.path.isdir(ef.DW_FINAL) and os.path.isdir(ef.CLF_EVAL)):
        pytest.skip("trained flagship checkpoints not present")

    prior = {
        "config": {"stale": "overwritten by the fresh run"},
        "denoise_sanity": {
            f"sigma={s}": {"t_star": 1, "clean_acc": 0.9, "noisy_acc": 0.1,
                           "denoised_acc": 0.9}
            for s in (0.25, 0.5, 1.0)
        },
        "attack_cw_linf_eps2000_strong": {"sentinel": "strong",
                                          "undefended": {"robust_acc": 0.0},
                                          "defended_diffusion_t3": {"robust_acc": 0.2}},
        "attack_cw_linf_eps65": {"sentinel": "eps65",
                                 "undefended": {"robust_acc": 0.9},
                                 "defended_diffusion_t3": {"robust_acc": 0.9}},
        "certify_sigma0.25": {"N": 2000,
                              "diffusion": {"sentinel": "d"},
                              "randsmooth_no_denoiser": {"sentinel": "r"}},
    }
    out = tmp_path / "real_flagship"
    out.mkdir()
    (out / "summary.json").write_text(json.dumps(prior))
    monkeypatch.setattr(ef, "OUT", str(out))

    # a load_pytree call would mean the lazy-build gate regressed (and would
    # crash on CPU anyway: TPU-sharded Orbax restore) — make it loud
    def _boom(path):
        raise AssertionError(f"fully-resumed run tried to load {path}")

    monkeypatch.setattr("diffusion_model_for_audio_defense_tpu.core."
                        "checkpoint.load_pytree", _boom)

    ef.main(["--cpu", "--resume", "--skip_lab23"])

    final = json.loads((out / "summary.json").read_text())
    assert final["denoise_sanity"] == prior["denoise_sanity"]
    assert final["attack_cw_linf_eps2000_strong"] == prior["attack_cw_linf_eps2000_strong"]
    assert final["attack_cw_linf_eps65"] == prior["attack_cw_linf_eps65"]
    assert final["certify_sigma0.25"] == prior["certify_sigma0.25"]
    # config is regenerated, not resumed: it records the *current* ckpts
    assert "stale" not in final["config"]


def test_resume_partial_attack_row_runs_defended_half_only(tmp_path, monkeypatch):
    """A row dumped with {"partial": true} resumes at the defended half."""
    ef = _load("eval_flagship")
    if not (os.path.isdir(ef.DW_FINAL) and os.path.isdir(ef.CLF_EVAL)):
        pytest.skip("trained flagship checkpoints not present")

    prior = {
        "denoise_sanity": {
            f"sigma={s}": {"denoised_acc": 0.9} for s in (0.25, 0.5, 1.0)
        },
        # killed mid-defended-run: only the undefended half landed
        "attack_cw_linf_eps2000_strong": {
            "eps_int16": 2000, "eps_float": 2000 / 32768.0, "max_iter_1": 100,
            "undefended": {"robust_acc": 0.0, "total": 50}, "partial": True,
        },
        "certify_sigma0.25": {"N": 2000, "diffusion": {},
                              "randsmooth_no_denoiser": {}},
    }
    out = tmp_path / "real_flagship"
    out.mkdir()
    (out / "summary.json").write_text(json.dumps(prior))
    monkeypatch.setattr(ef, "OUT", str(out))

    calls = []

    def fake_attack(argv):
        calls.append(argv)
        return {"robust_acc": 0.5, "total": 50}

    from diffusion_model_for_audio_defense_tpu.cli import adaptive_attack_eval
    monkeypatch.setattr(adaptive_attack_eval, "main", fake_attack)

    ef.main(["--cpu", "--resume", "--skip_lab23", "--strong_iters", "100"])

    # strong row: defended half only; eps65 row (absent from prior): both
    assert len(calls) == 3
    assert "Diffusion" in calls[0] and "None" not in calls[0]
    final = json.loads((out / "summary.json").read_text())
    strong = final["attack_cw_linf_eps2000_strong"]
    assert strong["undefended"] == {"robust_acc": 0.0, "total": 50}
    assert strong["defended_diffusion_t3"] == {"robust_acc": 0.5, "total": 50}
    assert "partial" not in strong
    assert final["attack_cw_linf_eps65"]["defended_diffusion_t3"]["robust_acc"] == 0.5
