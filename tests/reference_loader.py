"""Load the reference PyTorch models (read-only at /root/reference) for golden
parity tests.

The reference `ControllableCaptioningModel.__init__` reads verb->tense JSON
tables relative to the CWD (reference models/controllable_captioning.py:25-34),
so we materialize small fixture tables in a temp dir and chdir while
constructing models. No reference code is copied — the actual upstream modules
are imported and executed on CPU torch.
"""
import contextlib
import json
import os
import sys

REFERENCE = "/root/reference"


def _ensure_path():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


@contextlib.contextmanager
def reference_cwd(tmpdir, verb_2_vob_all=None, verb_2_vob=None):
    """Chdir into a dir holding the JSON fixtures the reference loads."""
    ddir = os.path.join(str(tmpdir), "datasets", "coco")
    os.makedirs(ddir, exist_ok=True)
    with open(os.path.join(ddir, "verb_2_vob_all_refine.json"), "w") as f:
        json.dump(verb_2_vob_all or {}, f)
    with open(os.path.join(ddir, "verb_2_vob.json"), "w") as f:
        json.dump(verb_2_vob or {}, f)
    old = os.getcwd()
    os.chdir(str(tmpdir))
    try:
        yield
    finally:
        os.chdir(old)


def load_reference_captioner(tmpdir, verb_2_vob_all=None, **kwargs):
    _ensure_path()
    with reference_cwd(tmpdir, verb_2_vob_all=verb_2_vob_all):
        from models.controllable_captioning import ControllableCaptioningModel
        model = ControllableCaptioningModel(**kwargs)
    model.eval()
    return model


def load_reference_ssp(**kwargs):
    _ensure_path()
    from models.sort_model import S_SSP
    import torch
    # S_SSP.__init__ calls torch.cuda.manual_seed which is a no-op on CPU-only
    model = S_SSP(**kwargs)
    model.eval()
    return model


def load_reference_sinkhorn(**kwargs):
    _ensure_path()
    from models.sinkhorn_network import SinkhornNet
    model = SinkhornNet(**kwargs)
    model.eval()
    return model
