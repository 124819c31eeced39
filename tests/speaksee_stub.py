"""Minimal speaksee stub so the reference data/field.py AND data/dataset.py
can be imported for golden parity tests (speaksee is not installed). Only
the surface those modules touch is provided: RawField, Example.fromdict,
PairedDataset (example/field containers), TextField.punctuations (the exact
upstream list — parity-defining for caption cleanup), and nostdout."""
import contextlib
import sys
import types


class RawField:
    def __init__(self, preprocessing=None, postprocessing=None):
        self.preprocessing = preprocessing
        self.postprocessing = postprocessing

    def preprocess(self, x):
        return self.preprocessing(x) if self.preprocessing else x


class TextField:
    # upstream speaksee.data.field.TextField.punctuations
    punctuations = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                    ".", "?", "!", ",", ":", "-", "--", "...", ";"]


class Example:
    @classmethod
    def fromdict(cls, d):
        ex = cls()
        for k, v in d.items():
            setattr(ex, k, v)
        return ex


class PairedDataset:
    def __init__(self, examples, fields):
        self.examples = examples
        self.fields = fields


class COCO:
    @staticmethod
    def get_samples(roots, ids):  # pragma: no cover - never used in tests
        raise NotImplementedError("stub: pass samples to get_samples directly")


@contextlib.contextmanager
def nostdout():
    yield


def install():
    if "speaksee" in sys.modules:
        return
    speaksee = types.ModuleType("speaksee")
    data = types.ModuleType("speaksee.data")
    field_mod = types.ModuleType("speaksee.data.field")
    utils = types.ModuleType("speaksee.utils")
    field_mod.RawField = RawField
    field_mod.TextField = TextField
    data.RawField = RawField
    data.field = field_mod
    data.Example = Example
    data.PairedDataset = PairedDataset
    data.COCO = COCO
    utils.nostdout = nostdout
    speaksee.data = data
    speaksee.utils = utils
    sys.modules["speaksee"] = speaksee
    sys.modules["speaksee.data"] = data
    sys.modules["speaksee.data.field"] = field_mod
    sys.modules["speaksee.utils"] = utils
