"""METEOR/SPICE wrapper tests with canned jar outputs (no Java needed).

The wrappers shell out to user-provided jars (reference: speaksee bundles
them; eval_coco.py:277,286). These tests monkeypatch subprocess.run to
return the jars' documented output formats and assert the input marshalling
+ output parsing, and that the unavailability error is explicit.
"""
import json
import subprocess
import types

import numpy as np
import pytest

from vsrcic_tpu.metrics.external import (ExternalMetricUnavailable, Meteor,
                                         Spice)

GTS = {0: ["a man holds a ball", "the man throws a ball"],
       1: ["a dog runs"]}
RES = {0: ["a man holds a red ball"], 1: ["the dog runs fast"]}


def test_meteor_unavailable_is_explicit(monkeypatch):
    monkeypatch.delenv("VSRCIC_METEOR_JAR", raising=False)
    with pytest.raises(ExternalMetricUnavailable):
        Meteor().compute_score(GTS, RES)


def test_spice_unavailable_is_explicit(monkeypatch):
    monkeypatch.delenv("VSRCIC_SPICE_JAR", raising=False)
    with pytest.raises(ExternalMetricUnavailable):
        Spice().compute_score(GTS, RES)


def test_meteor_parses_jar_output(tmp_path, monkeypatch):
    jar = tmp_path / "meteor-1.5.jar"
    jar.write_bytes(b"fake")
    seen = {}

    real_run = subprocess.run

    def fake_run(cmd, capture_output=None, text=None, check=None, **kw):
        if not (isinstance(cmd, list) and cmd and cmd[0] == "java"):
            return real_run(cmd, capture_output=capture_output, text=text,
                            check=check, **kw)
        # meteor-1.5 CLI: java -jar m.jar <test> <ref> -l en -norm -r <n>
        assert cmd[:2] == ["java", "-jar"] and cmd[2] == str(jar)
        with open(cmd[3]) as f:
            seen["tests"] = f.read().splitlines()
        with open(cmd[4]) as f:
            seen["refs"] = f.read().splitlines()
        assert cmd[cmd.index("-r") + 1] == "2"  # max refs per segment
        out = ("Segment 1 score:\t0.4312\n"
               "Segment 2 score:\t0.2211\n"
               "\n"
               "Precision:\t0.5\nRecall:\t0.6\n"
               "Final score:\t0.3261\n")
        return types.SimpleNamespace(stdout=out, returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    final, segs = Meteor(jar=str(jar)).compute_score(GTS, RES)
    assert final == pytest.approx(0.3261)
    np.testing.assert_allclose(segs, [0.4312, 0.2211])
    # marshalling: one test line per image; refs padded to n_refs per image
    assert seen["tests"] == ["a man holds a red ball", "the dog runs fast"]
    assert seen["refs"] == ["a man holds a ball", "the man throws a ball",
                            "a dog runs", "a dog runs"]


def test_spice_parses_jar_output(tmp_path, monkeypatch):
    jar = tmp_path / "spice-1.0.jar"
    jar.write_bytes(b"fake")
    seen = {}

    real_run = subprocess.run

    def fake_run(cmd, check=None, capture_output=None, text=None, **kw):
        if not (isinstance(cmd, list) and cmd and cmd[0] == "java"):
            return real_run(cmd, capture_output=capture_output, text=text,
                            check=check, **kw)
        inp = cmd[3]
        outp = cmd[cmd.index("-out") + 1]
        with open(inp) as f:
            seen["payload"] = json.load(f)
        with open(outp, "w") as f:
            json.dump([
                {"image_id": "0", "scores": {"All": {"f": 0.31, "pr": 0.4}}},
                {"image_id": "1", "scores": {"All": {"f": 0.12, "pr": 0.2}}},
            ], f)
        return types.SimpleNamespace(returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    mean, scores = Spice(jar=str(jar)).compute_score(GTS, RES)
    np.testing.assert_allclose(scores, [0.31, 0.12])
    assert mean == pytest.approx((0.31 + 0.12) / 2)
    assert seen["payload"][0] == {"image_id": "0",
                                  "test": "a man holds a red ball",
                                  "refs": GTS[0]}
