"""Phonetic blocking keys — spelling-variant tolerance for ER blocking.

Token blocking (link/er.py) cannot pair records that share NO exact
token: 'Jonson' vs 'Johnson', 'Meyer' vs 'Meier'. Record-linkage
practice adds a phonetic blocking pass (Soundex family, public since
Russell 1918) so such variants land in the same block and the scorer
gets to see them.

This is a SIMPLIFIED Soundex, documented as such, chosen to be
bit-identical across Spark and DuckDB with only translate/replace/
substring (the DuckDB regex engine is RE2 — no backreferences — so the
classic collapse-adjacent-digits regex is out):

    1. keep letters, uppercase
    2. first letter kept verbatim
    3. remaining letters -> digit classes via one translate()
       (vowels + H/W/Y -> 0; B F P V -> 1; C G J K Q S X Z -> 2;
        D T -> 3; L -> 4; M N -> 5; R -> 6)
    4. drop zeros, then collapse runs of each digit with two fixed
       replace('dd' -> 'd') passes per digit
    5. key = first letter + first 3 digits, zero-padded

Documented deltas vs strict Soundex: repeats separated by a vowel also
collapse (strict Soundex keeps them), and runs longer than 4 of one
digit may keep a duplicate. Both are fine for BLOCKING — keys only
gate which pairs get scored; the Jaccard scorer still decides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LETTERS = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
_DIGITS = "00000000111122222222334556"


def phonetic_key(col: Column) -> Column:
    """Simplified-Soundex blocking key; '' input -> '' key."""
    u = F.upper(F.regexp_replace(col, "[^A-Za-z]", ""))
    first = F.substring(u, 1, 1)
    coded = F.translate(u, _LETTERS, _DIGITS)
    rest = F.replace(F.substring(coded, 2, 100), F.lit("0"), F.lit(""))
    for d in "123456":
        for _ in range(2):
            rest = F.replace(rest, F.lit(d + d), F.lit(d))
    return F.when(u == "", F.lit("")).otherwise(
        F.concat(first, F.rpad(F.substring(rest, 1, 3), 3, "0"))
    )
