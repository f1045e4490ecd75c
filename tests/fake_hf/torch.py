"""Test-only fake of the `torch` API surface HFTokenClassificationModel
touches (tests/fake_hf — shipped to Spark workers with addPyFile so the
wrapper's load->tokenize->forward->align path runs without the real libs).
"""


class _InferenceMode:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def inference_mode():
    return _InferenceMode()
