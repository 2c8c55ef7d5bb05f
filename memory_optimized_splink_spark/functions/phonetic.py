"""Phonetic matchers: Double Metaphone (+alternate) and a q-gram tokeniser.

The reference registers these as Scala JAR UDFs — `Dmetaphone`,
`DmetaphoneAlt`, `QgramTokeniser`
(/root/reference/splink/internals/spark/jar_location.py:52-62) — for
name-matching comparisons. This engine implements Lawrence Philips' Double
Metaphone (published 2000, C/C++ reference implementation widely ported)
in Python, exposed as Arrow-batched pandas UDFs.

Scale note: the encoder is a per-string state machine, so inside each Arrow
batch it IS per-row Python — unlike the similarity kernels it cannot be
numpy-vectorized. That is fine off the hot path: phonetic keys are
attributes of VALUES, not of pairs, so at scale encode the DISTINCT values
once and join back (`with_phonetic_column` does exactly that — the same
shape as a TF table), never the pair table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

VOWELS = "AEIOUY"


def _is_vowel(word: str, i: int) -> bool:
    return 0 <= i < len(word) and word[i] in VOWELS


def _slavo_germanic(word: str) -> bool:
    return any(s in word for s in ("W", "K", "CZ", "WITZ"))


def _at(word: str, i: int, n: int, *subs: str) -> bool:
    """word[i:i+n] is one of subs (False out of range)."""
    if i < 0:
        return False
    return word[i:i + n] in subs


def double_metaphone(value: str | None, max_length: int = 4
                     ) -> tuple[str, str]:
    """(primary, secondary) Double Metaphone codes (Philips 2000)."""
    if value is None:
        return ("", "")
    # keep spaces: the SAN /VAN /VON and JOSE rules read them
    word = "".join(c for c in value.upper() if "A" <= c <= "Z" or c == " ")
    word = word.strip()
    if not word:
        return ("", "")
    length = len(word)
    last = length - 1
    sg = _slavo_germanic(word)
    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, s: str | None = None) -> None:
        pri.append(p)
        sec.append(p if s is None else s)

    i = 0
    # skip silent initial letters
    if word[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    # initial X pronounced Z -> S (e.g. Xavier)
    if word[0] == "X":
        add("S")
        i = 1

    while i < length and (len(pri) < max_length or len(sec) < max_length):
        c = word[i]
        if c in VOWELS:
            if i == 0:
                add("A")
            i += 1
        elif c == "B":
            add("P")
            i += 2 if _at(word, i + 1, 1, "B") else 1
        elif c == "C":
            # various Germanic / CH / CIA special cases
            if (i > 1 and not _is_vowel(word, i - 2)
                    and _at(word, i - 1, 3, "ACH")
                    and word[i + 2:i + 3] != "I"
                    and (word[i + 2:i + 3] != "E"
                         or _at(word, i - 2, 6, "BACHER", "MACHER"))):
                add("K")  # michael, bacher
                i += 2
            elif i == 0 and _at(word, i, 6, "CAESAR"):
                add("S")
                i += 2
            elif _at(word, i, 4, "CHIA"):
                add("K")
                i += 2
            elif _at(word, i, 2, "CH"):
                if i > 0 and _at(word, i, 4, "CHAE"):
                    add("K", "X")
                elif (i == 0
                      and (_at(word, i + 1, 5, "HARAC", "HARIS")
                           or _at(word, i + 1, 3, "HOR", "HYM", "HIA", "HEM"))
                      and not _at(word, 0, 5, "CHORE")):
                    add("K")  # Greek roots: chorus, chemistry
                elif (_at(word, 0, 4, "VAN ", "VON ")
                      or _at(word, 0, 3, "SCH")
                      or _at(word, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                      or _at(word, i + 2, 1, "T", "S")
                      or ((i == 0 or _at(word, i - 1, 1, "A", "O", "U", "E"))
                          and _at(word, i + 2, 1, "L", "R", "N", "M", "B",
                                  "H", "F", "V", "W", " "))
                      or _at(word, i + 2, 0, "")):
                    add("K")  # Germanic
                elif i > 0:
                    add("K" if _at(word, 0, 2, "MC") else "X", "K")
                else:
                    add("X")
                i += 2
            elif _at(word, i, 2, "CZ") and not _at(word, i - 2, 4, "WICZ"):
                add("S", "X")
                i += 2
            elif _at(word, i + 1, 3, "CIA"):
                add("X")
                i += 3
            elif _at(word, i, 2, "CC") and not (i == 1 and word[0] == "M"):
                if (_at(word, i + 2, 1, "I", "E", "H")
                        and not _at(word, i + 2, 2, "HU")):
                    if ((i == 1 and word[i - 1] == "A")
                            or _at(word, i - 1, 5, "UCCEE", "UCCES")):
                        add("KS")  # accident, succeed
                    else:
                        add("X")  # bacci, bertucci
                    i += 3
                else:
                    add("K")  # pierce's rule
                    i += 2
            elif _at(word, i, 2, "CK", "CG", "CQ"):
                add("K")
                i += 2
            elif _at(word, i, 2, "CI", "CE", "CY"):
                if _at(word, i, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
            else:
                add("K")
                if _at(word, i + 1, 2, " C", " Q", " G"):
                    i += 3
                elif (_at(word, i + 1, 1, "C", "K", "Q")
                      and not _at(word, i + 1, 2, "CE", "CI")):
                    i += 2
                else:
                    i += 1
        elif c == "D":
            if _at(word, i, 2, "DG"):
                if _at(word, i + 2, 1, "I", "E", "Y"):
                    add("J")  # edge
                    i += 3
                else:
                    add("TK")  # edgar
                    i += 2
            elif _at(word, i, 2, "DT", "DD"):
                add("T")
                i += 2
            else:
                add("T")
                i += 1
        elif c == "F":
            add("F")
            i += 2 if _at(word, i + 1, 1, "F") else 1
        elif c == "G":
            if _at(word, i + 1, 1, "H"):
                if i > 0 and not _is_vowel(word, i - 1):
                    add("K")
                    i += 2
                elif i == 0:
                    if word[i + 2:i + 3] == "I":
                        add("J")  # ghislane
                    else:
                        add("K")  # ghoul
                    i += 2
                elif (_at(word, i - 2, 1, "B", "H", "D")
                      or _at(word, i - 3, 1, "B", "H", "D")
                      or _at(word, i - 4, 1, "B", "H")):
                    i += 2  # silent: hugh, bough
                else:
                    if (i > 2 and word[i - 1] == "U"
                            and _at(word, i - 3, 1, "C", "G", "L", "R", "T")):
                        add("F")  # laugh, cough
                    elif i > 0 and word[i - 1] != "I":
                        add("K")
                    i += 2
                continue
            elif _at(word, i + 1, 1, "N"):
                if i == 1 and _is_vowel(word, 0) and not sg:
                    add("KN", "N")
                elif not _at(word, i + 2, 2, "EY") and word[i + 1:] != "Y" \
                        and not sg:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            elif _at(word, i + 1, 2, "LI") and not sg:
                add("KL", "L")  # tagliaro
                i += 2
                continue
            elif i == 0 and (word[i + 1:i + 2] == "Y"
                             or _at(word, i + 1, 2, "ES", "EP", "EB", "EL",
                                    "EY", "IB", "IL", "IN", "IE", "EI", "ER")):
                add("K", "J")
                i += 2
                continue
            # -ger-, -gy-
            elif ((_at(word, i + 1, 2, "ER") or word[i + 1:i + 2] == "Y")
                  and not _at(word, 0, 6, "DANGER", "RANGER", "MANGER")
                  and not _at(word, i - 1, 1, "E", "I")
                  and not _at(word, i - 1, 3, "RGY", "OGY")):
                add("K", "J")
                i += 2
                continue
            elif (_at(word, i + 1, 1, "E", "I", "Y")
                  or _at(word, i - 1, 4, "AGGI", "OGGI")):
                if (_at(word, 0, 4, "VAN ", "VON ") or _at(word, 0, 3, "SCH")
                        or _at(word, i + 1, 2, "ET")):
                    add("K")  # Germanic
                elif _at(word, i + 1, 4, "IER "):
                    add("J")
                elif word[i + 1:] == "IER":
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            else:
                add("K")
            i += 2 if _at(word, i + 1, 1, "G") else 1
        elif c == "H":
            # only pronounced between vowels or initially before a vowel
            if (i == 0 or _is_vowel(word, i - 1)) and _is_vowel(word, i + 1):
                add("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            if _at(word, i, 4, "JOSE") or _at(word, 0, 4, "SAN "):
                # end-of-string counts as the padding space of the original
                if (i == 0 and (word[i + 4:i + 5] == " " or length == 4)) \
                        or _at(word, 0, 4, "SAN "):
                    add("H")  # san jose / san jacinto
                else:
                    add("J", "H")
                i += 1
            else:
                if i == 0 and not _at(word, i, 4, "JOSE"):
                    add("J", "A")  # Yankelovich/Jankelowicz
                elif (_is_vowel(word, i - 1) and not sg
                      and (word[i + 1:i + 2] in ("A", "O"))):
                    add("J", "H")
                elif i == last:
                    add("J", "")
                elif (not _at(word, i + 1, 1, "L", "T", "K", "S", "N", "M",
                              "B", "Z")
                      and not _at(word, i - 1, 1, "S", "K", "L")):
                    add("J")
                i += 2 if _at(word, i + 1, 1, "J") else 1
        elif c == "K":
            add("K")
            i += 2 if _at(word, i + 1, 1, "K") else 1
        elif c == "L":
            if _at(word, i + 1, 1, "L"):
                # spanish: cabrillo, gallegos — final -illo/-illa/-alle
                if ((i == length - 3
                     and _at(word, i - 1, 4, "ILLO", "ILLA", "ALLE"))
                        or ((_at(word, last - 1, 2, "AS", "OS")
                             or _at(word, last, 1, "A", "O"))
                            and _at(word, i - 1, 4, "ALLE"))):
                    add("L", "")
                    i += 2
                    continue
                add("L")
                i += 2
            else:
                add("L")
                i += 1
        elif c == "M":
            add("M")
            if (_at(word, i - 1, 3, "UMB")
                    and (i + 1 == last or _at(word, i + 2, 2, "ER"))) \
                    or _at(word, i + 1, 1, "M"):
                i += 2  # dumb, thumb
            else:
                i += 1
        elif c == "N":
            add("N")
            i += 2 if _at(word, i + 1, 1, "N") else 1
        elif c == "P":
            if _at(word, i + 1, 1, "H"):
                add("F")
                i += 2
            else:
                add("P")
                i += 2 if _at(word, i + 1, 1, "P", "B") else 1
        elif c == "Q":
            add("K")
            i += 2 if _at(word, i + 1, 1, "Q") else 1
        elif c == "R":
            # french: final -ier/-iers silent-ish r in secondary
            if (i == last and not sg and _at(word, i - 2, 2, "IE")
                    and not _at(word, i - 4, 2, "ME", "MA")):
                add("", "R")
            else:
                add("R")
            i += 2 if _at(word, i + 1, 1, "R") else 1
        elif c == "S":
            if _at(word, i - 1, 3, "ISL", "YSL"):
                i += 1  # island, isle: silent
            elif i == 0 and _at(word, i, 5, "SUGAR"):
                add("X", "S")
                i += 1
            elif _at(word, i, 2, "SH"):
                if _at(word, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                i += 2
            elif _at(word, i, 3, "SIO", "SIA") or _at(word, i, 4, "SIAN"):
                add("S", "S" if sg else "X")
                i += 3
            elif (i == 0 and _at(word, i + 1, 1, "M", "N", "L", "W")) \
                    or _at(word, i + 1, 1, "Z"):
                add("S", "X")  # german/slavic: smith -> XMT secondary
                i += 2 if _at(word, i + 1, 1, "Z") else 1
            elif _at(word, i, 2, "SC"):
                if word[i + 2:i + 3] == "H":
                    if _at(word, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if _at(word, i + 3, 2, "ER", "EN"):
                            add("X", "SK")  # schermerhorn, schenker
                        else:
                            add("SK")  # school, schooner
                    elif i == 0 and not _is_vowel(word, 3) and word[3:4] != "W":
                        add("X", "S")
                    else:
                        add("X")
                    i += 3
                elif _at(word, i + 2, 1, "I", "E", "Y"):
                    add("S")
                    i += 3
                else:
                    add("SK")
                    i += 3
            elif i == last and _at(word, i - 2, 2, "AI", "OI"):
                add("", "S")  # french: resnais, artois
                i += 1
            else:
                add("S")
                i += 2 if _at(word, i + 1, 1, "S", "Z") else 1
        elif c == "T":
            if _at(word, i, 4, "TION"):
                add("X")
                i += 3
            elif _at(word, i, 3, "TIA", "TCH"):
                add("X")
                i += 3
            elif _at(word, i, 2, "TH") or _at(word, i, 3, "TTH"):
                if _at(word, i + 2, 2, "OM", "AM") \
                        or _at(word, 0, 4, "VAN ", "VON ") \
                        or _at(word, 0, 3, "SCH"):
                    add("T")  # thomas, thames, germanic
                else:
                    add("0", "T")
                i += 2
            else:
                add("T")
                i += 2 if _at(word, i + 1, 1, "T", "D") else 1
        elif c == "V":
            add("F")
            i += 2 if _at(word, i + 1, 1, "V") else 1
        elif c == "W":
            if _at(word, i, 2, "WR"):
                add("R")
                i += 2
            elif i == 0 and (_is_vowel(word, i + 1) or _at(word, i, 2, "WH")):
                if _is_vowel(word, i + 1):
                    add("A", "F")  # wasserman
                else:
                    add("A")  # wharton
                i += 1
            elif (i == last and _is_vowel(word, i - 1)) \
                    or _at(word, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") \
                    or _at(word, 0, 3, "SCH"):
                add("", "F")  # arnow -> ARN / ARNF
                i += 1
            elif _at(word, i, 4, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
            else:
                i += 1  # skip
        elif c == "X":
            if not (i == last
                    and (_at(word, i - 3, 3, "IAU", "EAU")
                         or _at(word, i - 2, 2, "AU", "OU"))):
                add("KS")  # french: breaux — silent final x
            i += 2 if _at(word, i + 1, 1, "C", "X") else 1
        elif c == "Z":
            if word[i + 1:i + 2] == "H":
                add("J")  # chinese pinyin: zhao
                i += 2
            else:
                if _at(word, i + 1, 2, "ZO", "ZI", "ZA") \
                        or (sg and i > 0 and word[i - 1] != "T"):
                    add("S", "TS")
                else:
                    add("S")
                i += 2 if _at(word, i + 1, 1, "Z") else 1
        else:
            i += 1

    p = "".join(pri)[:max_length]
    s = "".join(sec)[:max_length]
    return (p, s)


# ------------------------------------------------------------- pandas UDFs

@F.pandas_udf(StringType())
def dmetaphone_udf(s: pd.Series) -> pd.Series:
    return s.apply(lambda v: double_metaphone(v)[0])


@F.pandas_udf(StringType())
def dmetaphone_alt_udf(s: pd.Series) -> pd.Series:
    return s.apply(lambda v: double_metaphone(v)[1])


def qgram_tokenise(col: Column, q: int = 2) -> Column:
    """QgramTokeniser equivalent (reference jar_location.py:58): the set of
    q-grams of the lowercased string — native Spark expression (codegen)."""
    lowered = F.lower(col)
    n = F.greatest(F.length(lowered) - F.lit(q - 1), F.lit(1))
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), n), lambda i: lowered.substr(i, F.lit(q))))


def with_phonetic_column(df: DataFrame, column: str,
                         out: str | None = None,
                         alternate: bool = False) -> DataFrame:
    """Phonetic key via encode-distinct-then-join (the TF-table shape):
    at scale the UDF runs over the DISTINCT values of `column`, never the
    full table or the pair table. No broadcast hint — name-like columns are
    usually small enough that AQE picks a broadcast join at runtime, but a
    high-cardinality column must be allowed to fall back to a shuffle join
    instead of blowing the driver."""
    out = out or f"dm_{column}"
    udf = dmetaphone_alt_udf if alternate else dmetaphone_udf
    keys = df.select(column).distinct().select(
        F.col(column), udf(F.col(column)).alias(out))
    return df.join(keys, on=column, how="left")


def _qgrams_py(v: str | None, q: int = 2) -> list[str] | None:
    if v is None:
        return None  # match the native expression's NULL-in-NULL-out
    v = v.lower()
    n = max(len(v) - q + 1, 1)
    out, seen = [], set()
    for i in range(n):
        g = v[i:i + q]
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


@F.pandas_udf(ArrayType(StringType()))
def qgram_tokeniser_udf(s: pd.Series) -> pd.Series:
    """SQL-registrable QgramTokeniser (same output as qgram_tokenise's
    native expression — prefer the expression in DataFrame code)."""
    return s.apply(_qgrams_py)


def register_phonetic_udfs(spark) -> None:
    """SQL names mirroring the reference JAR (spark/jar_location.py:52-62)."""
    spark.udf.register("Dmetaphone", dmetaphone_udf)
    spark.udf.register("DmetaphoneAlt", dmetaphone_alt_udf)
    spark.udf.register("QgramTokeniser", qgram_tokeniser_udf)
