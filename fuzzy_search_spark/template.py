"""Template matching: grouping phrase matches into template matches.

The reference's FuzzyTemplateSearcher (search/template_searcher.py) checks
whether sequences of phrase matches satisfy a template of ordered/unordered,
required/optional label and group elements (pattern/fuzzy_template.py).
On Spark this is a per-document post-pass over that document's (sorted)
matches — tiny lists, so it runs inside the same pandas UDF as matching
(or as groupBy(url).applyInPandas over a matches table).

Replicated behaviors worth noting:
- matches are filtered to template labels only after checking that every
  required label is present somewhere in the document;
- ordered groups search each element from the *group start* (not the
  previous element's end) and tolerate optional-element gaps;
- the emitted TemplateMatch slices the caller's original match list with
  indexes computed over the filtered list (a reference quirk kept for
  parity);
- a match with no label never matches any element (labels are strings).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Union

from fuzzy_search_spark.matcher import Match


@dataclass(eq=False)
class LabelElement:
    label: str
    required: bool = False
    cardinality: str = "single"
    variable: bool = False
    type: str = "label"


@dataclass(eq=False)
class GroupElement:
    elements: list
    label: Optional[str] = None
    ordered: bool = True
    required: bool = False
    type: str = "group"

    def __post_init__(self):
        # a group containing a required element is itself required
        for element in self.elements:
            if element.required:
                self.required = True


@dataclass
class Template:
    root: GroupElement
    labels: set
    required_labels: set

    def has_label(self, label: Union[None, str, List[str]]) -> bool:
        if isinstance(label, list):
            return any(item in self.labels for item in label)
        return label in self.labels


def parse_template(template_json: Union[list, dict],
                   known_labels: Optional[set] = None,
                   ignore_unknown: bool = False) -> Template:
    """Parse a template JSON structure (reference fuzzy_template.py:283-400)."""
    labels: set = set()
    required: set = set()

    def parse_label(info) -> Optional[LabelElement]:
        if isinstance(info, str):
            info = {"label": info}
        label = info["label"]
        if known_labels is not None and label not in known_labels:
            if info.get("variable") is True:
                pass
            elif ignore_unknown:
                return None
            else:
                raise ValueError(
                    f"label '{label}' does not correspond to any phrase")
        element = LabelElement(
            label=label,
            required=bool(info.get("required", False)),
            cardinality=info.get("cardinality", "single"),
            variable=bool(info.get("variable", False)),
        )
        labels.add(label)
        if element.required:
            required.add(label)
        return element

    def parse_group(info: dict) -> GroupElement:
        elements = []
        for element_info in info["elements"]:
            if isinstance(element_info, str):
                element_info = {"label": element_info, "type": "label"}
            elif "type" not in element_info:
                element_info["type"] = ("group" if "elements" in element_info
                                        else "label")
            if element_info["type"] == "group":
                elements.append(parse_group(element_info))
            else:
                label_el = parse_label(element_info)
                if label_el is not None:
                    elements.append(label_el)
        return GroupElement(
            elements=elements,
            label=info.get("label"),
            ordered=bool(info.get("ordered", True)),
            required=bool(info.get("required", False)),
        )

    if isinstance(template_json, list):
        template_json = {
            "type": "group",
            "elements": [
                {"label": e, "type": "label"} if isinstance(e, str) else e
                for e in template_json
            ],
        }
    if "type" not in template_json:
        template_json["type"] = ("group" if "elements" in template_json
                                 else "label")
    if template_json["type"] == "label":
        template_json = {"type": "group", "elements": [template_json]}
    root = parse_group(template_json)
    return Template(root=root, labels=labels, required_labels=required)


@dataclass
class TemplateMatch:
    """One satisfied template over a span of phrase matches."""

    phrase_matches: List[Match]
    start: int
    end: int
    label_matches: List[dict] = field(default_factory=list)


def _label_set(label) -> set:
    return set(label) if isinstance(label, list) else {label}


def _share_label(element, match: Match) -> bool:
    return bool(_label_set(element.label) & _label_set(match.label))


def _element_start(matches: List[Match], element, start: int) -> int:
    for i in range(start, len(matches)):
        if _share_label(element, matches[i]):
            return i
    return -1


def _element_end(matches: List[Match], element, start: int) -> int:
    if start == -1:
        return -1
    for i in range(start, len(matches)):
        if not _share_label(element, matches[i]):
            return i
    return len(matches)


def _new_sequence(element, start: int, end: int) -> dict:
    return {"element_label": element.label, "element_type": element.type,
            "element": element, "start": start, "end": end,
            "phrase_matches": [], "contains_required": False,
            "element_sequences": []}


def _ordered_sequence(matches: List[Match], group: GroupElement,
                      start_index: int) -> Optional[dict]:
    """find_next_ordered_group_match_sequence (template_searcher.py:209-330)."""
    seq = _new_sequence(group, start_index, start_index)
    for element in group.elements:
        if isinstance(element, GroupElement):
            element_sequence = _group_sequence(matches, element, seq["end"])
        else:
            # NB: each element is searched from the *group* start
            e_start = _element_start(matches, element, seq["start"])
            e_end = _element_end(matches, element, e_start)
            element_sequence = _new_sequence(element, e_start, e_end)
            element_sequence["phrase_matches"] = matches[e_start:e_end]
        if (not element_sequence or element_sequence["start"] == -1):
            if element.required:
                return None
            continue
        if seq["start"] == seq["end"]:
            seq["element_sequences"].append(element_sequence)
            seq["start"] = element_sequence["start"]
            seq["end"] = element_sequence["end"]
            if element.required:
                seq["contains_required"] = True
        elif element_sequence["start"] <= seq["end"]:
            seq["element_sequences"].append(element_sequence)
            if element_sequence["end"] > seq["end"]:
                seq["end"] = element_sequence["end"]
        elif element.required and element_sequence["start"] > seq["end"]:
            if seq["contains_required"]:
                return None  # two required runs separated by a gap
            seq["element_sequences"] = [element_sequence]
            seq["start"] = element_sequence["start"]
            seq["end"] = element_sequence["end"]
            seq["contains_required"] = True
        # else: optional element separated by a gap — skipped
    if seq["start"] == -1:
        return None
    return seq


def _unordered_sequence(matches: List[Match], group: GroupElement,
                        start_index: int) -> Optional[dict]:
    """find_next_unordered_group_match_sequence (template_searcher.py:333-435)."""
    seq = _new_sequence(group, -1, -1)
    element_sequences = []
    for element in group.elements:
        if isinstance(element, GroupElement):
            element_sequence = _group_sequence(matches, element, start_index)
        else:
            e_start = _element_start(matches, element, start_index)
            e_end = _element_end(matches, element, e_start)
            element_sequence = _new_sequence(element, e_start, e_end)
            element_sequence["phrase_matches"] = matches[e_start:e_end]
        if element_sequence is None or element_sequence["start"] == -1:
            if element.required:
                return None
            continue
        element_sequences.append(element_sequence)
    element_sequences.sort(key=lambda s: s["start"])
    for element_sequence in element_sequences:
        if seq["start"] == -1:
            seq["start"] = element_sequence["start"]
            seq["end"] = element_sequence["end"]
            seq["element_sequences"].append(element_sequence)
        elif element_sequence["start"] <= seq["end"] < element_sequence["end"]:
            seq["end"] = element_sequence["end"]
            seq["element_sequences"].append(element_sequence)
        elif element_sequence["end"] <= seq["end"]:
            seq["element_sequences"].append(element_sequence)
        elif element_sequence["start"] > seq["end"] and \
                element_sequence["element"].required:
            if seq["contains_required"]:
                return None
            seq["start"] = element_sequence["start"]
            seq["end"] = element_sequence["end"]
            seq["element_sequences"] = [element_sequence]
        elif element_sequence["start"] > seq["end"]:
            break  # matches in between: belongs to a later sequence
    if seq["start"] == -1:
        return None
    return seq


def _group_sequence(matches: List[Match], group: GroupElement,
                    start_index: int) -> Optional[dict]:
    """find_next_group_match_sequence (template_searcher.py:438-498)."""
    if group.ordered:
        return _ordered_sequence(matches, group, start_index)
    sequence = _unordered_sequence(matches, group, start_index)
    while sequence:
        nxt = _unordered_sequence(matches, group, sequence["end"])
        if not nxt:
            break
        if nxt["start"] != sequence["end"]:
            break
        if nxt["end"] > sequence["end"]:
            sequence["end"] = nxt["end"]
            sequence["element_sequences"] += nxt["element_sequences"]
        else:
            break
    return sequence


def _flatten_label_matches(sequence: dict) -> List[dict]:
    """get_sequence_label_element_matches (template_searcher.py:180-206)."""
    if sequence["element_type"] == "label":
        return [{"label": sequence["element_label"],
                 "phrase_matches": sequence["phrase_matches"]}]
    out: List[dict] = []
    for element_sequence in sequence["element_sequences"]:
        for item in _flatten_label_matches(element_sequence):
            out.append(item)
            if sequence["element_label"]:
                item.setdefault("label_groups", []).append(
                    sequence["element_label"])
    return out


def find_template_matches(matches: Sequence[Match],
                          template: Template) -> List[TemplateMatch]:
    """FuzzyTemplateSearcher.find_template_matches (template_searcher.py:569-603)."""
    ordered_matches = sorted(matches, key=lambda m: m.offset)
    # required labels must all be present somewhere in the document
    present = set()
    for m in ordered_matches:
        present |= _label_set(m.label)
    if not template.required_labels <= present:
        return []
    filtered = [m for m in ordered_matches if template.has_label(m.label)]
    out: List[TemplateMatch] = []
    start_index = 0
    matches_list = list(matches)
    while start_index < len(filtered):
        seq = _group_sequence(filtered, template.root, start_index)
        if seq is None:
            break
        start_index = seq["end"]
        out.append(TemplateMatch(
            # reference quirk: slices the caller's original list with
            # indexes computed over the filtered list
            phrase_matches=matches_list[seq["start"]:seq["end"]],
            start=seq["start"], end=seq["end"],
            label_matches=_flatten_label_matches(seq),
        ))
    return out


def match_templates(matches_df, template: Template, url_col: str = "url"):
    """Distributed template matching: per-document sequence alignment over
    a MATCH_SCHEMA-shaped matches table via groupBy(url).applyInPandas
    (reference FuzzyTemplateSearcher.find_template_matches,
    template_searcher.py:569-603, distributed per document).

    The per-document match lists are tiny, so the Arrow round-trip cost is
    the group shuffle only; template logic itself stays pure Python.
    Output: one row per TemplateMatch."""
    import pandas as pd

    from pyspark.sql import types as T

    from .matcher import Match

    schema = T.StructType([
        T.StructField(url_col, T.StringType()),
        T.StructField("template_index", T.IntegerType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("n_matches", T.IntegerType()),
        T.StructField("first_offset", T.IntegerType()),
        T.StructField("last_end", T.IntegerType()),
        T.StructField("labels", T.ArrayType(T.StringType())),
    ])
    out_cols = [f.name for f in schema.fields]

    def per_url(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for url, grp in pdf.groupby(url_col, sort=False):
            grp = grp.sort_values(["offset", "end", "phrase"],
                                  kind="mergesort")
            matches = [
                Match(phrase=r.phrase, variant=r.variant, string=r.string,
                      offset=int(r.offset), end=int(r.end),
                      label=list(r.label) if r.label is not None else None,
                      char_match=float(r.char_match),
                      ngram_match=float(r.ngram_match),
                      levenshtein_similarity=float(r.levenshtein_similarity))
                for r in grp.itertuples()
            ]
            for ti, tm in enumerate(find_template_matches(matches, template)):
                pm = tm.phrase_matches
                labels = sorted({lab for m in pm
                                 for lab in _label_set(m.label)
                                 if lab is not None})
                rows.append((
                    url, ti, tm.start, tm.end, len(pm),
                    min((m.offset for m in pm), default=-1),
                    max((m.end for m in pm), default=-1), labels))
        return pd.DataFrame(rows, columns=out_cols)

    return matches_df.groupBy(url_col).applyInPandas(per_url, schema)
