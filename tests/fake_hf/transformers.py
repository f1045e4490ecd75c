"""Test-only fake of the `transformers` API surface
HFTokenClassificationModel touches: AutoTokenizer (is_split_into_words,
word_ids(), dynamic longest-in-batch padding, CLS/SEP specials) and
AutoModelForTokenClassification (forward -> .logits, config.id2label).

The fake "model" computes RuleNerModel tags over the raw tokens and emits
one-hot logits carrying the CORRECT label only at each word's FIRST
subword position; continuation subwords and padding carry a POISON label,
so a wrapper that mis-aligns subwords to words (or reads padded positions)
fails the rule_ner parity test instead of silently passing.
"""

from types import SimpleNamespace

LABELS = ["O", "B-PER", "I-PER", "B-ORG"]
LABEL2ID = {l: i for i, l in enumerate(LABELS)}
POISON = LABEL2ID["B-ORG"]

CLS_ID, SEP_ID, PAD_ID = 101, 102, 0


class _FakeTensor:
    """List-backed stand-in: supports .to(device), indexing, argmax(-1)."""

    def __init__(self, data):
        self.data = data

    def to(self, device):
        return self

    def __getitem__(self, i):
        return self.data[i]

    def __len__(self):
        return len(self.data)

    def argmax(self, dim):
        assert dim == -1

        def rec(x):
            if not isinstance(x[0], list):
                return max(range(len(x)), key=lambda j: x[j])
            return [rec(e) for e in x]

        return _FakeTensor(rec(self.data))


class _Encoding(dict):
    """dict of model inputs + the fast-tokenizer word_ids(row) accessor."""

    def word_ids(self, i):
        return self["word_ids"][i]


class AutoTokenizer:
    #: the real wrapper asserts is_fast (word_ids() is fast-only)
    is_fast = True

    @classmethod
    def from_pretrained(cls, model_name_or_path, use_fast=True):
        return cls()

    @staticmethod
    def _n_subwords(tok: str) -> int:
        # words longer than 4 chars split into 2 subwords: exercises the
        # first-subword alignment for real
        return 2 if len(tok) > 4 else 1

    def __call__(
        self,
        batch_tokens,
        is_split_into_words=False,
        padding=False,
        truncation=False,
        return_tensors=None,
    ):
        assert is_split_into_words, "wrapper must pass pre-split words"
        per_ids, per_wids = [], []
        for tokens in batch_tokens:
            ids, wids = [CLS_ID], [None]
            for wi, tok in enumerate(tokens):
                for _ in range(self._n_subwords(tok)):
                    ids.append(1000 + len(ids))
                    wids.append(wi)
            ids.append(SEP_ID)
            wids.append(None)
            per_ids.append(ids)
            per_wids.append(wids)
        maxlen = max(len(x) for x in per_ids)
        attn = []
        for ids, wids in zip(per_ids, per_wids):
            pad = maxlen - len(ids)
            attn.append([1] * len(ids) + [0] * pad)
            ids.extend([PAD_ID] * pad)
            wids.extend([None] * pad)
        return _Encoding(
            input_ids=_FakeTensor(per_ids),
            attention_mask=_FakeTensor(attn),
            raw_tokens=[list(t) for t in batch_tokens],
            word_ids=per_wids,
        )


class AutoModelForTokenClassification:
    @classmethod
    def from_pretrained(cls, model_name_or_path):
        return cls()

    def __init__(self):
        self.config = SimpleNamespace(
            id2label={i: l for i, l in enumerate(LABELS)}
        )

    def eval(self):
        return self

    def to(self, device):
        return self

    def __call__(
        self,
        input_ids=None,
        attention_mask=None,
        raw_tokens=None,
        word_ids=None,
        **kw,
    ):
        from pytorch_ie_spark.operators.models import RuleNerModel

        tags_batch = RuleNerModel().predict_tags(raw_tokens)
        logits = []
        for row, wids in enumerate(word_ids):
            seen = set()
            row_logits = []
            for wid in wids:
                if wid is None:
                    lab = LABEL2ID["O"]
                elif wid in seen:
                    lab = POISON  # continuation subword: must be ignored
                else:
                    seen.add(wid)
                    lab = LABEL2ID[tags_batch[row][wid]]
                row_logits.append(
                    [1.0 if j == lab else 0.0 for j in range(len(LABELS))]
                )
            logits.append(row_logits)
        return SimpleNamespace(logits=_FakeTensor(logits))
