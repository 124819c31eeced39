"""Minimal speaksee stub so the reference data/field.py can be imported for
golden field-parity tests (speaksee is not installed; only RawField is needed
by that module)."""
import sys
import types


class RawField:
    def __init__(self, preprocessing=None, postprocessing=None):
        self.preprocessing = preprocessing
        self.postprocessing = postprocessing

    def preprocess(self, x):
        return self.preprocessing(x) if self.preprocessing else x


def install():
    if "speaksee" in sys.modules:
        return
    speaksee = types.ModuleType("speaksee")
    data = types.ModuleType("speaksee.data")
    data.RawField = RawField
    speaksee.data = data
    sys.modules["speaksee"] = speaksee
    sys.modules["speaksee.data"] = data
