"""WordPunctTokenizer shim: NLTK's WordPunctTokenizer is documented as the
regexp tokenizer with pattern r"\w+|[^\w\s]+"; span_tokenize yields
(start, end) spans. Test-oracle use only."""
import re

_WORDPUNCT = re.compile(r"\w+|[^\w\s]+")


class WordPunctTokenizer:
    def span_tokenize(self, text):
        for m in _WORDPUNCT.finditer(text):
            yield m.start(), m.end()

    def tokenize(self, text):
        return _WORDPUNCT.findall(text)
