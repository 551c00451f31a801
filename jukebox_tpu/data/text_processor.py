"""Character-level lyrics tokeniser (equivalent of
jukebox/data/text_processor.py). v2 vocab has 80 tokens (includes '+'),
v3 has 79; token 0 is <unk>. Text is ascii-fied and stripped of
out-of-vocab characters before tokenising."""

import re

try:
    from unidecode import unidecode
except ImportError:  # fallback: NFKD-decompose accents, then drop non-ascii
    import unicodedata

    def unidecode(text):
        text = unicodedata.normalize("NFKD", text)
        return text.encode("ascii", errors="ignore").decode("ascii")


class TextProcessor:
    def __init__(self, v3=False):
        if v3:
            vocab = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
                     "0123456789.,:;!?-'\"()[] \t\n")
            not_vocab = re.compile(r"[^A-Za-z0-9.,:;!?\-'\"()\[\] \t\n]+")
        else:
            vocab = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
                     "0123456789.,:;!?-+'\"()[] \t\n")
            not_vocab = re.compile(r"[^A-Za-z0-9.,:;!?\-+'\"()\[\] \t\n]+")
        self.vocab = {char: idx + 1 for idx, char in enumerate(vocab)}
        self.vocab["<unk>"] = 0
        self.n_vocab = len(vocab) + 1
        self.tokens = {v: k for k, v in self.vocab.items()}
        self.tokens[0] = ""
        self.not_vocab = not_vocab

    def clean(self, text):
        text = unidecode(text)
        text = text.replace("\\", "\n")
        return self.not_vocab.sub("", text)

    def tokenise(self, text):
        return [self.vocab[char] for char in text]

    def textise(self, tokens):
        return "".join(self.tokens[token] for token in tokens)

    def characterise(self, tokens):
        return [self.tokens[token] for token in tokens]
