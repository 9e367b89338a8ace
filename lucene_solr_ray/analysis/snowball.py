"""Pure-Python Snowball stemmers for the top non-English languages
(``lucene/analysis/common/src/java/org/tartarus/snowball/ext/
GermanStemmer.java`` et al. — the reference wraps code generated from the
published Snowball algorithms, snowballstem.org).

These are independent implementations of the same published algorithms,
validated word-for-word against the reference's full TestSnowballVocab
vocabularies (20k-35k words per language) in tests/test_snowball.py.
Each stemmer registers in the filter zoo as ``<lang>_stem`` and as a
CustomAnalyzer chain ``<lang>_stemmed`` (standard tokenizer + lowercase +
stem), so ``build_index(analyzer="german_stemmed")`` works everywhere an
analyzer name does.
"""

from __future__ import annotations

# --- shared helpers ------------------------------------------------------


def _r_regions(word: str, vowels: str) -> tuple[int, int]:
    """Standard (R1, R2) start offsets: R1 = after the first non-vowel
    following a vowel; R2 = the same computed within R1."""
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


# --- German (snowballstem.org german algorithm) --------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = set("bdfghklmnrt")
_DE_ST_END = set("bdfghklmnt")


def _german_mark(word: str) -> str:
    """ß -> ss, then mark u/y between vowels as consonants."""
    word = word.replace("ß", "ss")
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = "U"
        if chars[i] == "y" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = "Y"
    return "".join(chars)


def german_stem(word: str) -> str:
    """Snowball German stemmer (GermanStemmer.java semantics)."""
    return _german_body(_german_mark(word))


def _german_body(word: str) -> str:
    """Steps 1-3 + finalization over an already-marked word."""
    # regions computed on the MARKED word: uppercase U/Y are consonants
    r1, r2 = _r_regions(word, _DE_VOWELS)
    # R1 region is adjusted so that it is at least 3 chars in
    r1 = max(r1, min(3, len(word)))

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1
    if word.endswith(("em", "ern", "er")):
        for suf in ("ern", "em", "er"):
            if word.endswith(suf):
                if in_r1(len(word) - len(suf)):
                    word = word[:-len(suf)]
                break
    elif word.endswith(("e", "en", "es")):
        for suf in ("en", "es", "e"):
            if word.endswith(suf):
                if in_r1(len(word) - len(suf)):
                    word = word[:-len(suf)]
                break
    elif word.endswith("s") and len(word) >= 2 \
            and word[-2] in _DE_S_END and in_r1(len(word) - 1):
        word = word[:-1]

    # step 2
    if word.endswith(("en", "er", "est")):
        for suf in ("est", "en", "er"):
            if word.endswith(suf):
                if in_r1(len(word) - len(suf)):
                    word = word[:-len(suf)]
                break
    elif word.endswith("st") and len(word) >= 6 \
            and word[-3] in _DE_ST_END and in_r1(len(word) - 2):
        word = word[:-2]

    # step 3 (d-suffixes)
    if word.endswith(("end", "ung")):
        if in_r2(len(word) - 3):
            word = word[:-3]
            if word.endswith("ig") and not word.endswith("eig") \
                    and in_r2(len(word) - 2):
                word = word[:-2]
    elif word.endswith(("ig", "ik", "isch")):
        for suf in ("isch", "ig", "ik"):
            if word.endswith(suf):
                if in_r2(len(word) - len(suf)) \
                        and word[len(word) - len(suf) - 1:len(word) - len(suf)] != "e":
                    word = word[:-len(suf)]
                break
    elif word.endswith(("lich", "heit")):
        if in_r2(len(word) - 4):
            word = word[:-4]
            if word.endswith(("er", "en")) and in_r1(len(word) - 2):
                word = word[:-2]
    elif word.endswith("keit"):
        if in_r2(len(word) - 4):
            word = word[:-4]
            if word.endswith("lich") and in_r2(len(word) - 4):
                word = word[:-4]
            elif word.endswith("ig") and in_r2(len(word) - 2):
                word = word[:-2]

    # finally
    word = word.replace("U", "u").replace("Y", "y")
    word = (word.replace("ä", "a").replace("ö", "o").replace("ü", "u"))
    return word


# --- Spanish (snowballstem.org spanish algorithm) -------------------------

_ES_VOWELS = "aeiouáéíóúü"


def _rv_es(word: str, vowels: str) -> int:
    """Romance-language RV: if the second letter is a consonant, RV is
    after the next vowel; if the first two letters are vowels, after the
    next consonant; otherwise after the third letter; end of word if not
    found."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[0] in vowels and word[1] in vowels:
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    return 3


_ES_ACCENT = str.maketrans("áéíóú", "aeiou")

_ES_PRONOUNS = ("selas", "selos", "sela", "selo", "las", "les", "los",
                "nos", "me", "se", "la", "le", "lo")
_ES_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRE_B = ("iendo", "ando", "ar", "er", "ir")

_ES_STEP2B_LONG = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais", "ieseis",
    "asteis", "isteis", "ábamos", "áramos", "ásemos", "arían", "arías",
    "aréis", "erían", "erías", "eréis", "irían", "irías", "iréis",
    "ieran", "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
    "arais", "aseis", "íamos", "arán", "arás", "aría", "erán", "erás",
    "ería", "irán", "irás", "iría", "iera", "iese", "aste", "iste",
    "aban", "aran", "asen", "aron", "ando", "abas", "adas", "idas",
    "aras", "ases", "íais", "ados", "idos", "amos", "imos", "ará",
    "aré", "erá", "eré", "irá", "iré", "aba", "ada", "ida", "ara",
    "ase", "ían", "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id",
    "an", "ió", "ar", "er", "ir", "as", "ís")


def spanish_stem(word: str) -> str:
    """Snowball Spanish stemmer (SpanishStemmer.java semantics)."""
    n0 = len(word)
    r1, r2 = _r_regions(word, _ES_VOWELS)
    rv = _rv_es(word, _ES_VOWELS)

    def in_r1(p): return p >= r1
    def in_r2(p): return p >= r2
    def in_rv(p): return p >= rv

    # step 0: attached pronoun — the among runs with the window LIMITED
    # to RV (setlimit tomark pV in the generated code): a pronoun or
    # verb ending reaching before RV simply does not match, and shorter
    # alternatives are tried
    def _match_rv(suffixes):
        best = None
        for suf in suffixes:
            if word.endswith(suf) and in_rv(len(word) - len(suf)):
                if best is None or len(suf) > len(best):
                    best = suf
        return best

    pron = _match_rv(_ES_PRONOUNS)
    if pron is not None:
        base = word[:-len(pron)]

        def _pre_in_rv(pre):
            return base.endswith(pre) and len(base) - len(pre) >= rv

        hit_a = max((p for p in _ES_PRE_A if _pre_in_rv(p)),
                    key=len, default=None)
        hit_b = max((p for p in _ES_PRE_B if _pre_in_rv(p)),
                    key=len, default=None)
        if hit_a is not None and (hit_b is None or len(hit_a) >= len(hit_b)):
            word = base[:-len(hit_a)] + hit_a.translate(_ES_ACCENT)
        elif hit_b is not None:
            word = base
        elif base.endswith("yendo") and len(base) >= 6 \
                and base[-6] == "u" and len(base) - 5 >= rv:
            word = base

    # step 1: standard suffixes (one longest-match family)
    n_before_1 = len(word)

    def try_del(suffixes, region, repl=""):
        nonlocal word
        for suf in sorted(suffixes, key=len, reverse=True):
            if word.endswith(suf):
                if region(len(word) - len(suf)):
                    word = word[:-len(suf)] + repl
                    return True
                return False
        return False

    fams = []  # (suffix family sorted by length handled as one "among")
    # the whole step-1 list is ONE longest-match among — collect
    # (suffix, action) pairs and pick the longest matching suffix
    actions: list[tuple[str, str]] = []
    for s in ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
              "ismos", "able", "ables", "ible", "ibles", "ista",
              "istas", "oso", "osa", "osos", "osas", "amiento",
              "amientos", "imiento", "imientos"):
        actions.append((s, "del_r2"))
    for s in ("adora", "ador", "ación", "adoras", "adores", "aciones",
              "ante", "antes", "ancia", "ancias"):
        actions.append((s, "del_r2_ic"))
    actions += [("logía", "logia"), ("logías", "logia")]
    actions += [("ución", "ucion"), ("uciones", "ucion")]
    actions += [("encia", "encia"), ("encias", "encia")]
    actions += [("amente", "amente"), ("mente", "mente")]
    actions += [("idad", "idad"), ("idades", "idad")]
    for s in ("iva", "ivo", "ivas", "ivos"):
        actions.append((s, "iv"))

    best = None
    for suf, act in actions:
        if word.endswith(suf):
            if best is None or len(suf) > len(best[0]):
                best = (suf, act)
    if best is not None:
        suf, act = best
        p = len(word) - len(suf)
        if act == "del_r2":
            if in_r2(p):
                word = word[:p]
        elif act == "del_r2_ic":
            if in_r2(p):
                word = word[:p]
                if word.endswith("ic") and in_r2(len(word) - 2):
                    word = word[:-2]
        elif act == "logia":
            if in_r2(p):
                word = word[:p] + "log"
        elif act == "ucion":
            if in_r2(p):
                word = word[:p] + "u"
        elif act == "encia":
            if in_r2(p):
                word = word[:p] + "ente"
        elif act == "amente":
            if in_r1(p):
                word = word[:p]
                if word.endswith("iv") and in_r2(len(word) - 2):
                    word = word[:-2]
                    if word.endswith("at") and in_r2(len(word) - 2):
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and in_r2(len(word) - 2):
                            word = word[:-2]
                            break
        elif act == "mente":
            if in_r2(p):
                word = word[:p]
                for pre in ("ante", "able", "ible"):
                    if word.endswith(pre) and in_r2(len(word) - 4):
                        word = word[:-4]
                        break
        elif act == "idad":
            if in_r2(p):
                word = word[:p]
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and in_r2(len(word) - len(pre)):
                        word = word[:-len(pre)]
                        break
        elif act == "iv":
            if in_r2(p):
                word = word[:p]
                if word.endswith("at") and in_r2(len(word) - 2):
                    word = word[:-2]

    # step 2a: verb suffixes beginning y (only if step 1 removed
    # nothing); RV-limited among, u-precondition per entry
    if len(word) == n_before_1:
        n_before_2a = len(word)
        y_suf = _match_rv(("yeron", "yendo", "yamos", "yais", "yan",
                           "yen", "yas", "yes", "ya", "ye", "yo", "yó"))
        if y_suf is not None and len(word) > len(y_suf) \
                and word[-len(y_suf) - 1] == "u":
            word = word[:-len(y_suf)]
        # step 2b (only if 2a removed nothing): ONE RV-limited among
        # over the union; the gu-undouble applies to its group only
        if len(word) == n_before_2a:
            gu_group = ("éis", "emos", "en", "es")
            suf = _match_rv(_ES_STEP2B_LONG + gu_group)
            if suf is not None:
                word = word[:-len(suf)]
                if suf in gu_group and word.endswith("gu"):
                    word = word[:-1]

    # step 3: residual suffix (RV-limited among over the union)
    suf = _match_rv(("os", "a", "o", "á", "í", "ó", "e", "é"))
    if suf is not None:
        word = word[:-len(suf)]
        if suf in ("e", "é") and word.endswith("gu") \
                and len(word) - 1 >= rv:
            word = word[:-1]

    return word.translate(_ES_ACCENT)


# --- Italian (snowballstem.org italian algorithm) -------------------------

_IT_VOWELS = "aeiouàèìòù"
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRONOUNS = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene", "gli", "ci", "la", "le", "li", "lo", "mi",
    "ne", "si", "ti", "vi")

_IT_STEP2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
    "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo", "immo",
    "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are",
    "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere",
    "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita",
    "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir")


def italian_stem(word: str) -> str:
    """Snowball Italian stemmer (ItalianStemmer.java semantics)."""
    word = word.translate(_IT_ACUTE)
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
        elif 0 < i < len(chars) - 1 and chars[i] in "ui" \
                and chars[i - 1] in _IT_VOWELS and chars[i + 1] in _IT_VOWELS:
            chars[i] = "U" if chars[i] == "u" else "I"
    word = "".join(chars)

    r1, r2 = _r_regions(word, _IT_VOWELS)
    rv = _rv_es(word, _IT_VOWELS)

    def in_r1(p): return p >= r1
    def in_r2(p): return p >= r2

    def _match_rv(suffixes):
        best = None
        for suf in suffixes:
            if word.endswith(suf) and len(word) - len(suf) >= rv:
                if best is None or len(suf) > len(best):
                    best = suf
        return best

    # step 0: attached pronoun (RV-limited)
    pron = _match_rv(_IT_PRONOUNS)
    if pron is not None:
        base = word[:-len(pron)]

        def _pre(pre):
            return base.endswith(pre) and len(base) - len(pre) >= rv

        hit_a = max((p for p in ("ando", "endo") if _pre(p)),
                    key=len, default=None)
        hit_b = max((p for p in ("ar", "er", "ir") if _pre(p)),
                    key=len, default=None)
        if hit_a is not None:
            word = base
        elif hit_b is not None:
            word = base + "e"

    # step 1: standard suffixes — one longest-match among, per-entry
    # region conditions (no backtracking on a failed condition)
    n_before_1 = len(word)
    actions: list[tuple[str, str]] = []
    for s in ("anza", "anze", "ico", "ici", "ica", "ice", "iche",
              "ichi", "ismo", "ismi", "abile", "abili", "ibile",
              "ibili", "ista", "iste", "isti", "istà", "istè", "istì",
              "oso", "osi", "osa", "ose", "mente", "atrice", "atrici",
              "ante", "anti"):
        actions.append((s, "del_r2"))
    for s in ("azione", "azioni", "atore", "atori"):
        actions.append((s, "del_r2_ic"))
    actions += [("logia", "log"), ("logie", "log")]
    for s in ("uzione", "uzioni", "usione", "usioni"):
        actions.append((s, "u"))
    actions += [("enza", "ente"), ("enze", "ente")]
    for s in ("amento", "amenti", "imento", "imenti"):
        actions.append((s, "del_rv"))
    actions.append(("amente", "amente"))
    actions.append(("ità", "ita"))
    for s in ("ivo", "ivi", "iva", "ive"):
        actions.append((s, "iv"))

    best = None
    for suf, act in actions:
        if word.endswith(suf):
            if best is None or len(suf) > len(best[0]):
                best = (suf, act)
    if best is not None:
        suf, act = best
        p = len(word) - len(suf)
        if act == "del_r2":
            if in_r2(p):
                word = word[:p]
        elif act == "del_r2_ic":
            if in_r2(p):
                word = word[:p]
                if word.endswith("ic") and in_r2(len(word) - 2):
                    word = word[:-2]
        elif act in ("log", "u", "ente"):
            if in_r2(p):
                word = word[:p] + act
        elif act == "del_rv":
            if p >= rv:
                word = word[:p]
        elif act == "amente":
            if in_r1(p):
                word = word[:p]
                if word.endswith("iv") and in_r2(len(word) - 2):
                    word = word[:-2]
                    if word.endswith("at") and in_r2(len(word) - 2):
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "abil"):
                        if word.endswith(pre) \
                                and in_r2(len(word) - len(pre)):
                            word = word[:-len(pre)]
                            break
        elif act == "ita":
            if in_r2(p):
                word = word[:p]
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and in_r2(len(word) - len(pre)):
                        word = word[:-len(pre)]
                        break
        elif act == "iv":
            if in_r2(p):
                word = word[:p]
                if word.endswith("at") and in_r2(len(word) - 2):
                    word = word[:-2]
                    if word.endswith("ic") and in_r2(len(word) - 2):
                        word = word[:-2]

    # step 2: verb suffixes (only if step 1 removed nothing), RV-limited
    if len(word) == n_before_1:
        suf = _match_rv(_IT_STEP2)
        if suf is not None:
            word = word[:-len(suf)]

    # step 3a: final vowel (+ preceding i), RV-limited
    suf = _match_rv(("a", "e", "i", "o", "à", "è", "ì", "ò"))
    if suf is not None:
        word = word[:-1]
        if word.endswith("i") and len(word) - 1 >= rv:
            word = word[:-1]
    # step 3b: ch/gh -> c/g, RV-limited
    for suf, repl in (("ch", "c"), ("gh", "g")):
        if word.endswith(suf) and len(word) - len(suf) >= rv:
            word = word[:-len(suf)] + repl
            break

    return word.replace("U", "u").replace("I", "i")


# --- Portuguese (snowballstem.org portuguese algorithm) -------------------

_PT_VOWELS = "aeiouáéíóúâêô"

_PT_STEP2 = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "áveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
    "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
    "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
    "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
    "erás", "eras", "irás", "avas", "ares", "eres", "ires", "íeis",
    "ados", "idos", "ámos", "amos", "emos", "imos", "iras", "ada",
    "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado",
    "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar",
    "er", "ir", "as", "es", "is", "eu", "iu", "ou")


def portuguese_stem(word: str) -> str:
    """Snowball Portuguese stemmer (PortugueseStemmer.java semantics).
    Nasal vowels encode as ``a~``/``o~`` (vowel + consonant) for region
    arithmetic, exactly like the published algorithm."""
    word = word.replace("ã", "a~").replace("õ", "o~")

    r1, r2 = _r_regions(word, _PT_VOWELS)
    rv = _rv_es(word, _PT_VOWELS)

    def in_r1(p): return p >= r1
    def in_r2(p): return p >= r2

    def _match_rv(suffixes):
        best = None
        for suf in suffixes:
            if word.endswith(suf) and len(word) - len(suf) >= rv:
                if best is None or len(suf) > len(best):
                    best = suf
        return best

    n0 = len(word)
    # step 1: standard suffixes
    actions: list[tuple[str, str]] = []
    for s in ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
              "ismos", "ável", "ível", "ista", "istas", "oso", "osa",
              "osos", "osas", "amento", "amentos", "imento",
              "imentos"):
        actions.append((s, "del_r2"))
    # NOTE: this matches the generated stemmer the reference ships
    # (2010 snapshot): the adora/ação family has NO ic follow-up and
    # there is no uça~o -> u rule — both were later snowball revisions
    # (goldens from TestSnowballVocabData pin the shipped behavior)
    for s in ("adora", "ador", "aça~o", "adoras", "adores", "aço~es",
              "ante", "antes", "ância"):
        actions.append((s, "del_r2"))
    actions += [("logia", "log"), ("logias", "log")]
    actions += [("ência", "ente"), ("ências", "ente")]
    actions.append(("amente", "amente"))
    actions.append(("mente", "mente"))
    actions += [("idade", "idade"), ("idades", "idade")]
    for s in ("iva", "ivo", "ivas", "ivos"):
        actions.append((s, "iv"))
    actions += [("ira", "eira"), ("iras", "eira")]

    best = None
    for suf, act in actions:
        if word.endswith(suf):
            if best is None or len(suf) > len(best[0]):
                best = (suf, act)
    if best is not None:
        suf, act = best
        p = len(word) - len(suf)
        if act == "del_r2":
            if in_r2(p):
                word = word[:p]
        elif act == "del_r2_ic":
            if in_r2(p):
                word = word[:p]
                if word.endswith("ic") and in_r2(len(word) - 2):
                    word = word[:-2]
        elif act in ("log", "u", "ente"):
            if in_r2(p):
                word = word[:p] + act
        elif act == "amente":
            if in_r1(p):
                word = word[:p]
                if word.endswith("iv") and in_r2(len(word) - 2):
                    word = word[:-2]
                    if word.endswith("at") and in_r2(len(word) - 2):
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and in_r2(len(word) - 2):
                            word = word[:-2]
                            break
        elif act == "mente":
            if in_r2(p):
                word = word[:p]
                for pre in ("ante", "avel", "ível"):
                    if word.endswith(pre) and in_r2(len(word) - 4):
                        word = word[:-4]
                        break
        elif act == "idade":
            if in_r2(p):
                word = word[:p]
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and in_r2(len(word) - len(pre)):
                        word = word[:-len(pre)]
                        break
        elif act == "iv":
            if in_r2(p):
                word = word[:p]
                if word.endswith("at") and in_r2(len(word) - 2):
                    word = word[:-2]
        elif act == "eira":
            # ira/iras -> ir if in RV and preceded by e
            if p >= rv and p >= 1 and word[p - 1] == "e":
                word = word[:p] + "ir"

    # step 2: verb suffixes (only if step 1 removed nothing)
    if len(word) == n0:
        suf = _match_rv(_PT_STEP2)
        if suf is not None:
            word = word[:-len(suf)]

    # step 3 if a suffix was removed in step 1 or 2, else step 4
    if len(word) != n0:
        if word.endswith("i") and len(word) - 1 >= rv \
                and word.endswith("ci"):
            word = word[:-1]
    else:
        suf = _match_rv(("os", "a", "i", "o", "á", "í", "ó"))
        if suf is not None:
            word = word[:-len(suf)]

    # step 5 (always)
    suf = _match_rv(("e", "é", "ê"))
    if suf is not None:
        word = word[:-1]
        for pre, ch in (("gu", "u"), ("ci", "i")):
            if word.endswith(pre) and len(word) - 1 >= rv:
                word = word[:-1]
                break
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    return word.replace("a~", "ã").replace("o~", "õ")


# --- French (snowballstem.org french algorithm) ---------------------------

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _rv_fr(word: str) -> int:
    """French RV: after the third letter if the word starts with two
    vowels; else after the first vowel not at the beginning; par/col/tap
    prefixes define RV directly after them."""
    if word[:3] in ("par", "col", "tap"):
        return 3
    n = len(word)
    if n >= 2 and word[0] in _FR_VOWELS and word[1] in _FR_VOWELS:
        return min(3, n)
    for i in range(1, n):
        if word[i] in _FR_VOWELS:
            return i + 1
    return n


_FR_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez",
    "issons", "irais", "irait", "irent", "iriez", "irons", "iront",
    "isses", "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
    "ies", "ira", "ît", "ie", "ir", "is", "it", "i")

_FR_STEP2B_ER = (
    "eraIent", "erions", "èrent", "erais", "erait", "erez", "eriez",
    "erons", "eront", "erai", "eras", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é")
_FR_STEP2B_A = (
    "assions", "assiez", "assent", "asses", "antes", "aIent", "asse",
    "ants", "ante", "âmes", "âtes", "ant", "ais", "ait", "as", "ai",
    "ât", "a")


def french_stem(word: str) -> str:
    """Snowball French stemmer (FrenchStemmer.java semantics)."""
    chars = list(word)
    n = len(chars)
    # one left-to-right pass over the LIVE buffer: an already-marked
    # neighbor (Y/U/I, uppercase) no longer counts as a vowel for the
    # letters after it — e.g. croyiez -> croYiez, NOT croYIez
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and chars[i - 1] in _FR_VOWELS
        next_v = i + 1 < n and chars[i + 1] in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    word = "".join(chars)

    r1, r2 = _r_regions(word, _FR_VOWELS)
    rv = _rv_fr(word)

    def in_r1(p): return p >= r1
    def in_r2(p): return p >= r2
    def in_rv(p): return p >= rv

    def _match_rv(suffixes):
        best = None
        for suf in suffixes:
            if word.endswith(suf) and len(word) - len(suf) >= rv:
                if best is None or len(suf) > len(best):
                    best = suf
        return best

    altered = False
    did_step1_ment = False

    # --- step 1: standard suffixes (one longest-match among) ---
    actions: list[tuple[str, str]] = []
    for s in ("ance", "iqUe", "isme", "able", "iste", "eux", "ances",
              "iqUes", "ismes", "ables", "istes"):
        actions.append((s, "del_r2"))
    for s in ("atrice", "ateur", "ation", "atrices", "ateurs",
              "ations"):
        actions.append((s, "at"))
    actions += [("logie", "log"), ("logies", "log")]
    for s in ("usion", "ution", "usions", "utions"):
        actions.append((s, "u"))
    actions += [("ence", "ent"), ("ences", "ent")]
    actions += [("ement", "ement"), ("ements", "ement")]
    actions += [("ité", "ite"), ("ités", "ite")]
    for s in ("if", "ive", "ifs", "ives"):
        actions.append((s, "if"))
    actions.append(("eaux", "eaux"))
    actions.append(("aux", "aux"))
    actions += [("euse", "euse"), ("euses", "euse")]
    actions += [("issement", "issement"), ("issements", "issement")]
    actions.append(("amment", "amment"))
    actions.append(("emment", "emment"))
    actions += [("ment", "ment"), ("ments", "ment")]

    best = None
    for suf, act in actions:
        if word.endswith(suf):
            if best is None or len(suf) > len(best[0]):
                best = (suf, act)
    if best is not None:
        suf, act = best
        p = len(word) - len(suf)
        if act == "del_r2":
            if in_r2(p):
                word = word[:p]
                altered = True
        elif act == "at":
            if in_r2(p):
                word = word[:p]
                altered = True
                if word.endswith("ic"):
                    if in_r2(len(word) - 2):
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        elif act in ("log", "u", "ent"):
            if in_r2(p):
                word = word[:p] + act
                altered = True
        elif act == "ement":
            if in_rv(p):
                word = word[:p]
                altered = True
                if word.endswith("iv") and in_r2(len(word) - 2):
                    word = word[:-2]
                    if word.endswith("at") and in_r2(len(word) - 2):
                        word = word[:-2]
                elif word.endswith("eus"):
                    if in_r2(len(word) - 3):
                        word = word[:-3]
                    elif in_r1(len(word) - 3):
                        word = word[:-3] + "eux"
                elif word.endswith(("abl", "iqU")) \
                        and in_r2(len(word) - 3):
                    word = word[:-3]
                elif word.endswith(("ièr", "Ièr")) \
                        and in_rv(len(word) - 3):
                    word = word[:-3] + "i"
        elif act == "ite":
            if in_r2(p):
                word = word[:p]
                altered = True
                if word.endswith("abil"):
                    if in_r2(len(word) - 4):
                        word = word[:-4]
                    else:
                        word = word[:-4] + "abl"
                elif word.endswith("ic"):
                    if in_r2(len(word) - 2):
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word.endswith("iv") and in_r2(len(word) - 2):
                    word = word[:-2]
        elif act == "if":
            if in_r2(p):
                word = word[:p]
                altered = True
                if word.endswith("at") and in_r2(len(word) - 2):
                    word = word[:-2]
                    if word.endswith("ic"):
                        if in_r2(len(word) - 2):
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
        elif act == "eaux":
            word = word[:p] + "eau"
            altered = True
        elif act == "aux":
            if in_r1(p):
                word = word[:p] + "al"
                altered = True
        elif act == "euse":
            if in_r2(p):
                word = word[:p]
                altered = True
            elif in_r1(p):
                word = word[:p] + "eux"
                altered = True
        elif act == "issement":
            if in_r1(p) and p >= 1 and word[p - 1] not in _FR_VOWELS:
                word = word[:p]
                altered = True
        elif act == "amment":
            if in_rv(p):
                word = word[:p] + "ant"
                did_step1_ment = True
        elif act == "emment":
            if in_rv(p):
                word = word[:p] + "ent"
                did_step1_ment = True
        elif act == "ment":
            if p >= 1 and word[p - 1] in _FR_VOWELS and in_rv(p - 1):
                word = word[:p]
                did_step1_ment = True

    # --- step 2a (if step 1 removed nothing, or a ment family hit) ---
    if not altered or did_step1_ment:
        suf = _match_rv(_FR_STEP2A)
        if suf is not None and len(word) - len(suf) - 1 >= rv \
                and word[-len(suf) - 1] not in _FR_VOWELS:
            word = word[:-len(suf)]
            altered = True
        else:
            # --- step 2b (step 2a failed to remove) ---
            suf = _match_rv(("ions",) + _FR_STEP2B_ER + _FR_STEP2B_A)
            if suf is not None:
                p = len(word) - len(suf)
                if suf == "ions":
                    if in_r2(p):
                        word = word[:p]
                        altered = True
                elif suf in _FR_STEP2B_ER:
                    word = word[:p]
                    altered = True
                else:
                    word = word[:p]
                    altered = True
                    if word.endswith("e") and in_rv(len(word) - 1):
                        word = word[:-1]

    if altered:
        # --- step 3 ---
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # --- step 4 ---
        if word.endswith("s") and len(word) >= 2 \
                and word[-2] not in "aiouès":
            word = word[:-1]
        suf = _match_rv(("Ière", "ière", "Ier", "ier", "ion", "e", "ë"))
        if suf is not None:
            p = len(word) - len(suf)
            if suf == "ion":
                if in_r2(p) and p >= 1 and word[p - 1] in "st":
                    word = word[:p]
            elif suf in ("ier", "ière", "Ier", "Ière"):
                word = word[:p] + "i"
            elif suf == "e":
                word = word[:p]
            elif suf == "ë":
                if word[:p].endswith("gu"):
                    word = word[:p]

    # --- step 5: undouble ---
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(end):
            word = word[:-1]
            break

    # --- step 6: un-accent ---
    i = len(word) - 1
    seen_nonvowel = False
    while i >= 0:
        # markers Y/U/I are consonants here (that is what the marking
        # is for): bibliothèqU -> è counts as accent-before-non-vowels
        if word[i] in _FR_VOWELS:
            break
        seen_nonvowel = True
        i -= 1
    if seen_nonvowel and i >= 0 and word[i] in "éè":
        word = word[:i] + "e" + word[i + 1:]

    return word.replace("I", "i").replace("U", "u").replace("Y", "y")



def german2_stem(word: str) -> str:
    """Snowball german2 variant (German2Stemmer.java): ae/oe/ue are
    treated as umlaut writings and fold to the same stems as the umlaut
    forms. The U/Y consonant marking runs FIRST (the published variant's
    prelude), so a 'u' between vowels — already a consonant-marked U —
    never participates in the ue -> ü rewrite, and 'ue' after q stays."""
    word = _german_mark(word)
    out = []
    i = 0
    n = len(word)
    while i < n:
        c = word[i]
        nxt = word[i + 1] if i + 1 < n else ""
        if c == "q" and nxt == "u":
            # the prelude's 'qu' (hop 2): qu plus the next TWO chars
            # pass through unrewritten (so 'quae' keeps its ae)
            out.append(word[i:i + 4])
            i += 4
            continue
        if c in "aou" and nxt == "e":
            out.append({"a": "ä", "o": "ö", "u": "ü"}[c])
            i += 2
            continue
        out.append(c)
        i += 1
    return _german_body("".join(out))


# --- Russian (snowballstem.org russian algorithm) -------------------------

_RU_VOWELS = "аеиоуыэюя"

_RU_PGERUND_1 = ("вшись", "вши", "в")                 # preceded by а/я
_RU_PGERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJ = ("ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие",
           "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
           "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PART_1 = ("ем", "нн", "вш", "ющ", "щ")            # preceded by а/я
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = ("ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем",
              "ло", "но", "ет", "ют", "ны", "ть", "й", "л", "н")
_RU_VERB_2 = ("ейте", "уйте", "ила", "ыла", "ена", "ите", "или",
              "ыли", "ило", "ыло", "ено", "ует", "уют", "ены",
              "ить", "ыть", "ишь", "ей", "уй", "ил",
              "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю")
_RU_NOUN = ("иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев",
            "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям",
            "ем", "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
            "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я")


def russian_stem(word: str) -> str:
    """Snowball Russian stemmer (RussianStemmer.java semantics)."""
    rv = len(word)
    for i, ch in enumerate(word):
        if ch in _RU_VOWELS:
            rv = i + 1
            break
    r1, r2 = _r_regions(word, _RU_VOWELS)

    def match_rv(suffixes):
        best = None
        for suf in suffixes:
            if word.endswith(suf) and len(word) - len(suf) >= rv:
                if best is None or len(suf) > len(best):
                    best = suf
        return best

    def match_rv_ay(suffixes):
        """Group-1 endings: only when preceded by а or я (the а/я stays
        and must itself be inside RV — it is part of the matched
        pattern in the generated among)."""
        best = None
        for suf in suffixes:
            for pre in ("а", "я"):
                full = pre + suf
                if word.endswith(full) and len(word) - len(full) >= rv:
                    if best is None or len(suf) > len(best):
                        best = suf
        return best

    # step 1: perfective gerund, else [reflexive] + adjectival/verb/noun
    g2 = match_rv(_RU_PGERUND_2)
    g1 = match_rv_ay(_RU_PGERUND_1)
    if g2 is not None and (g1 is None or len(g2) >= len(g1) + 1):
        word = word[:-len(g2)]
    elif g1 is not None:
        word = word[:-len(g1)]
    else:
        refl = match_rv(("ся", "сь"))
        if refl is not None:
            word = word[:-len(refl)]
        adj = match_rv(_RU_ADJ)
        if adj is not None:
            word = word[:-len(adj)]
            p2 = match_rv(_RU_PART_2)
            p1 = match_rv_ay(_RU_PART_1)
            if p2 is not None and (p1 is None or len(p2) >= len(p1) + 1):
                word = word[:-len(p2)]
            elif p1 is not None:
                word = word[:-len(p1)]
        else:
            v2 = match_rv(_RU_VERB_2)
            v1 = match_rv_ay(_RU_VERB_1)
            if v2 is not None and (v1 is None or len(v2) >= len(v1) + 1):
                word = word[:-len(v2)]
            elif v1 is not None:
                word = word[:-len(v1)]
            else:
                noun = match_rv(_RU_NOUN)
                if noun is not None:
                    word = word[:-len(noun)]

    # step 2: final и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # step 3: derivational (R2)
    for suf in ("ость", "ост"):
        if word.endswith(suf) and len(word) - len(suf) >= r2:
            word = word[:-len(suf)]
            break

    # step 4
    if word.endswith("нн") and len(word) - 2 >= rv:
        word = word[:-1]
    else:
        sup = match_rv(("ейше", "ейш"))
        if sup is not None:
            word = word[:-len(sup)]
            if word.endswith("нн") and len(word) - 2 >= rv:
                word = word[:-1]
        elif word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word



# --- Scandinavian trio (danish / norwegian / swedish algorithms) ----------

def _r1_min3(word: str, vowels: str) -> int:
    """R1 with the Scandinavian adjustment: at least 3 chars before."""
    r1, _ = _r_regions(word, vowels)
    return max(r1, min(3, len(word)))


_DA_VOWELS = "aeiouyæåø"
_DA_S_END = set("abcdfghjklmnoprtvyzå")
_DA_STEP1 = ("erendes", "erende", "hedens", "ethed", "erede", "heden",
             "heder", "endes", "ernes", "erens", "erets", "ered",
             "ende", "erne", "eren", "erer", "heds", "enes", "eres",
             "ens", "ere", "ene", "ers", "ets", "hed", "es", "et",
             "er", "en", "e", "eret")


def danish_stem(word: str) -> str:
    """Snowball Danish stemmer (DanishStemmer.java semantics)."""
    r1 = _r1_min3(word, _DA_VOWELS)

    def m_r1(suffixes):
        best = None
        for suf in suffixes:
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                if best is None or len(suf) > len(best):
                    best = suf
        return best

    suf = m_r1(_DA_STEP1)
    if suf is not None:
        word = word[:-len(suf)]
    elif word.endswith("s") and len(word) - 1 >= r1 \
            and len(word) >= 2 and word[-2] in _DA_S_END:
        word = word[:-1]

    # step 2: consonant-pair truncation
    for pair in ("gd", "dt", "gt", "kt"):
        if word.endswith(pair) and len(word) - 2 >= r1:
            word = word[:-1]
            break

    # step 3 (one among: ig/lig/elig/els delete + repeat step 2;
    # løst -> løs; all R1-anchored)
    if word.endswith("igst"):
        word = word[:-2]
    cands = [(c, "del") for c in ("elig", "lig", "els", "ig")
             if word.endswith(c) and len(word) - len(c) >= r1]
    if word.endswith("løst") and len(word) - 4 >= r1:
        cands.append(("løst", "løs"))
    if cands:
        suf, act = max(cands, key=lambda c: len(c[0]))
        if act == "del":
            word = word[:-len(suf)]
            for pair in ("gd", "dt", "gt", "kt"):
                if word.endswith(pair) and len(word) - 2 >= r1:
                    word = word[:-1]
                    break
        else:
            word = word[:-1]

    # step 4: undouble a final double consonant in R1
    if len(word) >= 2 and word[-1] == word[-2] \
            and word[-1] not in _DA_VOWELS and len(word) - 1 >= r1:
        word = word[:-1]
    return word


_NO_VOWELS = "aeiouyæåø"
_NO_S_END = set("bcdfghjlmnoprtvyz")


def norwegian_stem(word: str) -> str:
    """Snowball Norwegian stemmer (NorwegianStemmer.java semantics)."""
    r1 = _r1_min3(word, _NO_VOWELS)

    def m_r1(suffixes):
        best = None
        for suf in suffixes:
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                if best is None or len(suf) > len(best):
                    best = suf
        return best

    # step 1 is ONE among incl. the conditional s and erte/ert entries
    cands = []
    for suf in ("hetenes", "hetene", "hetens", "heten", "heter",
                "endes", "ande", "ende", "edes", "enes",
                "ene", "ane", "ede", "ens", "ers", "ets", "het",
                "ast", "en", "ar", "er", "as", "es", "et",
                "a", "e"):
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            cands.append((suf, "del"))
    for suf in ("erte", "ert"):
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            cands.append((suf, "er"))
    if word.endswith("s") and len(word) - 1 >= r1 and len(word) >= 2:
        prev = word[-2]
        if prev in _NO_S_END or (prev == "k" and (len(word) < 3 or
                                 word[-3] not in _NO_VOWELS)):
            cands.append(("s", "del"))
    if cands:
        suf, act = max(cands, key=lambda c: len(c[0]))
        word = word[:-len(suf)] + ("er" if act == "er" else "")

    # step 2: dt / vt -> drop last letter
    for pair in ("dt", "vt"):
        if word.endswith(pair) and len(word) - 2 >= r1:
            word = word[:-1]
            break

    # step 3
    suf = None
    for cand in ("hetslov", "eleg", "elig", "elov", "slov", "leg",
                 "eig", "lig", "els", "lov", "ig"):
        if word.endswith(cand) and len(word) - len(cand) >= r1:
            if suf is None or len(cand) > len(suf):
                suf = cand
    if suf is not None:
        word = word[:-len(suf)]
    return word


_SV_VOWELS = "aeiouyäåö"
_SV_S_END = set("bcdfghjklmnoprtvy")
_SV_STEP1 = ("heterna", "hetens", "anden", "heten", "heter", "arnas",
             "ernas", "ornas", "arens", "andes", "arna", "erna",
             "orna", "ande", "arne", "aste", "aren", "ades", "erns",
             "ade", "are", "ern", "ens", "het", "ast", "andet",
             "ad", "en", "ar", "er", "or", "as", "es", "at", "a", "e")


def swedish_stem(word: str) -> str:
    """Snowball Swedish stemmer (SwedishStemmer.java semantics)."""
    r1 = _r1_min3(word, _SV_VOWELS)

    def m_r1(suffixes):
        best = None
        for suf in suffixes:
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                if best is None or len(suf) > len(best):
                    best = suf
        return best

    suf = m_r1(_SV_STEP1)
    s_ok = (word.endswith("s") and len(word) - 1 >= r1
            and len(word) >= 2 and word[-2] in _SV_S_END)
    if suf is not None and (not s_ok or len(suf) >= 1):
        word = word[:-len(suf)]
    elif s_ok:
        word = word[:-1]

    for pair in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        if word.endswith(pair) and len(word) - 2 >= r1:
            word = word[:-1]
            break

    cands = []
    for cand, act in (("lig", "del"), ("ig", "del"), ("els", "del"),
                      ("löst", "lös"), ("fullt", "full")):
        if word.endswith(cand) and len(word) - len(cand) >= r1:
            cands.append((cand, act))
    if cands:
        cand, act = max(cands, key=lambda c: len(c[0]))
        word = word[:-len(cand)] + ("" if act == "del" else act)
    return word


# --- Dutch (snowballstem.org dutch algorithm) -----------------------------

_NL_VOWELS = "aeiouyè"
_NL_UNACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def dutch_stem(word: str) -> str:
    """Snowball Dutch stemmer (DutchStemmer.java semantics)."""
    word = word.translate(_NL_UNACCENT)
    chars = list(word)
    n = len(chars)
    for i in range(n):
        if chars[i] == "y" and (i == 0 or chars[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif chars[i] == "i" and 0 < i < n - 1 \
                and chars[i - 1] in _NL_VOWELS \
                and chars[i + 1] in _NL_VOWELS:
            chars[i] = "I"
    word = "".join(chars)

    r1, r2 = _r_regions(word, _NL_VOWELS)
    r1 = max(r1, min(3, len(word)))

    def undouble(w: str) -> str:
        return w[:-1] if w.endswith(("kk", "dd", "tt")) else w

    def valid_s_end(w: str) -> bool:
        return len(w) >= 1 and w[-1] not in _NL_VOWELS and w[-1] != "j"

    def valid_en_end(w: str) -> bool:
        return (len(w) >= 1 and w[-1] not in _NL_VOWELS
                and not w.endswith("gem"))

    # step 1: ONE among — longest suffix wins, then ITS condition is
    # tested with no backtracking ('heden' matching but failing R1
    # blocks the shorter 'en', exactly like the generated code)
    suf = max((c for c in ("heden", "ene", "en", "se", "s")
               if word.endswith(c)), key=len, default=None)
    if suf == "heden":
        if len(word) - 5 >= r1:
            word = word[:-5] + "heid"
    elif suf in ("ene", "en"):
        base = word[:-len(suf)]
        if len(word) - len(suf) >= r1 and valid_en_end(base):
            word = undouble(base)
    elif suf in ("se", "s"):
        base = word[:-len(suf)]
        if len(word) - len(suf) >= r1 and valid_s_end(base):
            word = base

    # step 2
    e_removed = False
    if word.endswith("e") and len(word) - 1 >= r1 \
            and len(word) >= 2 and word[-2] not in _NL_VOWELS:
        word = undouble(word[:-1])
        e_removed = True

    # step 3a
    if word.endswith("heid") and len(word) - 4 >= r2 \
            and (len(word) < 5 or word[-5] != "c"):
        word = word[:-4]
        if word.endswith("en"):
            base = word[:-2]
            if len(word) - 2 >= r1 and valid_en_end(base):
                word = undouble(base)

    # step 3b: d-suffixes
    if word.endswith(("end", "ing")):
        if len(word) - 3 >= r2:
            word = word[:-3]
            if word.endswith("ig") and len(word) - 2 >= r2 \
                    and not word.endswith("eig"):
                word = word[:-2]
            else:
                word = undouble(word)
    elif word.endswith("ig"):
        if len(word) - 2 >= r2 and not word.endswith("eig"):
            word = word[:-2]
    elif word.endswith("lijk"):
        if len(word) - 4 >= r2:
            word = word[:-4]
            if word.endswith("e") and len(word) - 1 >= r1 \
                    and len(word) >= 2 and word[-2] not in _NL_VOWELS:
                word = undouble(word[:-1])
    elif word.endswith("baar"):
        if len(word) - 4 >= r2:
            word = word[:-4]
    elif word.endswith("bar"):
        if len(word) - 3 >= r2 and e_removed:
            word = word[:-3]

    # step 4: undouble vowel — C v v C with the last C not I
    if len(word) >= 4:
        c1, v1, v2, c2 = word[-4], word[-3], word[-2], word[-1]
        if (c1 not in _NL_VOWELS and c2 not in _NL_VOWELS and c2 != "I"
                and v1 == v2 and v1 in "aeou"):
            word = word[:-2] + word[-1]

    return word.replace("I", "i").replace("Y", "y")


# --- Finnish (snowballstem.org finnish algorithm) --------------------------

_FI_VOWELS = "aeiouyäö"
_FI_LONGV = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_AEI = "aeiä"
_FI_PARTICLE_END = _FI_VOWELS + "nt"

_FI_CASE_SUFFIXES = (
    # (suffix, case): cases mirror FinnishStemmer.java a_6 —
    # "del" plain delete; "hXn" requires its own vowel before (abort on
    # fail); "cv" = a/ä after consonant+vowel (abort); "e" = tta/ttä
    # after e (abort); "n" = delete + LONG/ie extension; "VI"/"LONG"
    # are MATCH-TIME conditions evaluated inside the R1 limit — failing
    # them falls back to shorter entries ('n'), unlike command aborts
    ("seen", "LONG"), ("siin", "VI"), ("tten", "VI"), ("den", "VI"),
    # NOTE: the shipped among has NO hun/hyn entries — 'kuuhun' goes
    # through the plain 'n' case (golden-pinned)
    ("han", "hXn"), ("hen", "hXn"), ("hin", "hXn"), ("hon", "hXn"),
    ("hän", "hXn"), ("hön", "hXn"),
    ("lla", "del"), ("ssa", "del"), ("lta", "del"), ("sta", "del"),
    ("tta", "e"), ("llä", "del"), ("ssä", "del"), ("ltä", "del"),
    ("stä", "del"), ("ttä", "e"), ("lle", "del"), ("ine", "del"),
    ("ksi", "del"), ("na", "del"), ("nä", "del"), ("ta", "del"),
    ("tä", "del"), ("a", "cv"), ("ä", "cv"), ("n", "n"),
)


def finnish_stem(word: str) -> str:
    """Snowball Finnish stemmer (FinnishStemmer.java semantics: R1/R2
    setlimit amongs with parent-chain fallback during matching, command
    aborts without fallback, ending_removed gating i- vs t-plural)."""
    r1, r2 = _r_regions(word, _FI_VOWELS)
    ending_removed = False

    # --- particle etc (R1-limited among, command abort) ---
    cand = max((c for c in ("kaan", "kään", "kin", "han", "hän", "ko",
                            "kö", "pa", "pä", "sti")
                if word.endswith(c) and len(word) - len(c) >= r1),
               key=len, default=None)
    if cand == "sti":
        if len(word) - 3 >= r2:
            word = word[:-3]
    elif cand is not None:
        p = len(word) - len(cand)
        if p >= 1 and word[p - 1] in _FI_PARTICLE_END:
            word = word[:p]

    # --- possessive (R1-limited among, command abort) ---
    cand = max((c for c in ("nsa", "nsä", "mme", "nne", "ni", "si",
                            "an", "än", "en")
                if word.endswith(c) and len(word) - len(c) >= r1),
               key=len, default=None)
    if cand is not None:
        p = len(word) - len(cand)
        if cand == "si":
            if not (p >= 1 and word[p - 1] == "k"):
                word = word[:p]
        elif cand == "ni":
            word = word[:p]
            if word.endswith("kse"):
                word = word[:-1] + "i"
        elif cand in ("nsa", "nsä", "mme", "nne"):
            word = word[:p]
        elif cand == "an":
            if word[:p].endswith(("lla", "ssa", "lta", "sta", "ta",
                                  "na")):
                word = word[:p]
        elif cand == "än":
            if word[:p].endswith(("llä", "ssä", "ltä", "stä", "tä",
                                  "nä")):
                word = word[:p]
        elif cand == "en":
            if word[:p].endswith(("lle", "ine")):
                word = word[:p]

    # --- case ending (R1-limited; VI/LONG are match-time conditions) ---
    best = None
    for suf, case in _FI_CASE_SUFFIXES:
        if not word.endswith(suf):
            continue
        p = len(word) - len(suf)
        if p < r1:
            continue
        if case == "VI":
            # 'i' preceded by a V2 vowel (V2 excludes y), both inside
            # the R1 limit
            if not (p >= 2 and word[p - 1] == "i"
                    and word[p - 2] in "aeiouäö" and p - 2 >= r1):
                continue
        elif case == "LONG":
            if not (p >= 2 and word[p - 2:p] in _FI_LONGV
                    and p - 2 >= r1):
                continue
        if best is None or len(suf) > len(best[0]):
            best = (suf, case)
    if best is not None:
        suf, case = best
        p = len(word) - len(suf)
        if case in ("del", "VI", "LONG"):
            word = word[:p]
            ending_removed = True
        elif case == "hXn":
            if p >= 1 and word[p - 1] == suf[1]:
                word = word[:p]
                ending_removed = True
        elif case == "cv":
            if p >= 2 and word[p - 1] in _FI_VOWELS \
                    and word[p - 2] not in _FI_VOWELS:
                word = word[:p]
                ending_removed = True
        elif case == "e":
            if p >= 1 and word[p - 1] == "e":
                word = word[:p]
                ending_removed = True
        elif case == "n":
            word = word[:p]
            ending_removed = True
            if word.endswith("ie") or word[-2:] in _FI_LONGV:
                word = word[:-1]

    # --- other endings (R2-limited among; mpX not after po) ---
    cand = max((c for c in ("impi", "impa", "impä", "immi", "imma",
                            "immä", "mpi", "mpa", "mpä", "mmi", "mma",
                            "mmä", "eja", "ejä")
                if word.endswith(c) and len(word) - len(c) >= r2),
               key=len, default=None)
    if cand is not None:
        p = len(word) - len(cand)
        if cand in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
            if not (p >= 2 and word[p - 2:p] == "po"):
                word = word[:p]
        else:
            word = word[:p]

    # --- i-plural (if an ending was removed) else t-plural ---
    if ending_removed:
        if word.endswith(("i", "j")) and len(word) - 1 >= r1:
            word = word[:-1]
    else:
        if word.endswith("t") and len(word) - 1 >= r1 \
                and len(word) >= 2 and word[-2] in _FI_VOWELS:
            word = word[:-1]
            # then an R2-limited among over {imma, mma (not po)}
            if word.endswith("imma") and len(word) - 4 >= r2:
                word = word[:-4]
            elif word.endswith("mma") and len(word) - 3 >= r2 \
                    and not word[:-3].endswith("po"):
                word = word[:-3]

    # --- tidy (substeps a-d inside the R1 limit, e unrestricted) ---
    # a) ends LONG -> drop one
    if len(word) >= 2 and word[-2:] in _FI_LONGV \
            and len(word) - 1 >= r1 and len(word) - 2 >= r1:
        word = word[:-1]
    # b) final a/e/i/ä preceded by a non-vowel -> drop it
    if len(word) >= 2 and word[-1] in _FI_AEI \
            and word[-2] not in _FI_VOWELS and len(word) - 1 >= r1 \
            and len(word) - 2 >= r1:
        word = word[:-1]
    # c) oj / uj -> drop j
    if word.endswith(("oj", "uj")) and len(word) - 1 >= r1 \
            and len(word) - 2 >= r1:
        word = word[:-1]
    # d) jo -> drop o
    if word.endswith("jo") and len(word) - 1 >= r1 \
            and len(word) - 2 >= r1:
        word = word[:-1]
    # e) undouble the final consonant pair (vowels may follow)
    i = len(word) - 1
    while i >= 0 and word[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and word[i] not in _FI_VOWELS and word[i - 1] == word[i]:
        word = word[:i] + word[i + 1:]
    return word


# --- English / Porter2 (snowballstem.org english algorithm) ---------------
# (EnglishStemmer.java — the Snowball 'english' stemmer, distinct from
# both porter variants; full-vocabulary golden-validated)

_EN_VOWELS = "aeiouy"
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_END = "cdeghkmnrt"

_EN_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXCEPTIONS2 = {"inning", "outing", "canning", "herring", "earring",
                   "proceed", "exceed", "succeed"}


def _short_syllable(w, i):
    """True if a short syllable ends at index i (inclusive)."""
    # (a) non-vowel, vowel, non-vowel(not wxY) ending at i
    if i >= 2 and w[i] not in _EN_VOWELS and w[i] not in "wxY" \
            and w[i - 1] in _EN_VOWELS and w[i - 2] not in _EN_VOWELS:
        return True
    # (b) vowel at start followed by non-vowel
    if i == 1 and w[0] in _EN_VOWELS and w[1] not in _EN_VOWELS:
        return True
    return False


def english_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    if word in _EN_EXCEPTIONS:
        return _EN_EXCEPTIONS[word]
    if word.startswith("'"):
        word = word[1:]
    # y marking
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    n = len(word)
    # R1 with gener/commun/arsen exception
    r1 = None
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    if r1 is None:
        r1 = n
        for i in range(1, n):
            if word[i] not in _EN_VOWELS and word[i - 1] in _EN_VOWELS:
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if word[i] not in _EN_VOWELS and word[i - 1] in _EN_VOWELS:
            r2 = i + 1
            break

    def in_r1(p): return p >= r1
    def in_r2(p): return p >= r2

    # step 0
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[:-len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) - 3 > 1 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(c in _EN_VOWELS for c in word[:-2]):
            word = word[:-1]

    if word in _EN_EXCEPTIONS2:
        return word.replace("Y", "y")

    # step 1b
    suf = None
    for c in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if word.endswith(c):
            suf = c
            break
    if suf in ("eed", "eedly"):
        if in_r1(len(word) - len(suf)):
            word = word[:-len(suf)] + "ee"
    elif suf is not None:
        stem = word[:-len(suf)]
        if any(c in _EN_VOWELS for c in stem):
            word = stem
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word.endswith(_EN_DOUBLES):
                word = word[:-1]
            elif _is_short(word, r1):
                word += "e"

    # step 1c
    if len(word) >= 3 and word[-1] in "yY" \
            and word[-2] not in _EN_VOWELS:
        word = word[:-1] + "i"

    # step 2 (R1)
    step2 = (("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
             ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
             ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
             ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
             ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
             ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
             ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
             ("bli", "ble"), ("ogi", None), ("li", None))
    for c, rep in step2:
        if word.endswith(c):
            p = len(word) - len(c)
            if c == "ogi":
                if in_r1(p) and p >= 1 and word[p - 1] == "l":
                    word = word[:p] + "og"
            elif c == "li":
                if in_r1(p) and p >= 1 and word[p - 1] in _EN_LI_END:
                    word = word[:p]
            else:
                if in_r1(p):
                    word = word[:p] + rep
            break

    # step 3 (R1)
    step3 = (("ational", "ate"), ("tional", "tion"), ("alize", "al"),
             ("icate", "ic"), ("iciti", "ic"), ("ative", None),
             ("ical", "ic"), ("ness", ""), ("ful", ""))
    for c, rep in step3:
        if word.endswith(c):
            p = len(word) - len(c)
            if c == "ative":
                if in_r2(p):
                    word = word[:p]
            elif in_r1(p):
                word = word[:p] + rep
            break

    # step 4 (R2)
    step4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant",
             "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
             "al", "er", "ic")
    for c in step4:
        if word.endswith(c):
            p = len(word) - len(c)
            if c == "ion":
                if in_r2(p) and p >= 1 and word[p - 1] in "st":
                    word = word[:p]
            elif in_r2(p):
                word = word[:p]
            break

    # step 5
    if word.endswith("e"):
        p = len(word) - 1
        if in_r2(p) or (in_r1(p) and not _ends_short_syllable(word[:-1])):
            word = word[:p]
    elif word.endswith("l"):
        p = len(word) - 1
        if in_r2(p) and p >= 1 and word[p - 1] == "l":
            word = word[:p]

    return word.replace("Y", "y")


def _ends_short_syllable(w):
    return _short_syllable(w, len(w) - 1) if w else False


def _is_short(word, r1):
    return r1 >= len(word) and _ends_short_syllable(word)

# --- Romanian (snowballstem.org romanian algorithm) ------------------------
# (RomanianStemmer.java — step_0/combining/standard amongs match
# unrestricted with the R1/R2 test applied to the matched suffix (no
# backtracking); the verb among alone runs under the RV setlimit, with
# its preceded-by condition also inside the limit; golden-validated)

_RO_VOWELS = "aăâeiîou"   # a ă â e i î o u

_RO_STEP0 = (
    ("iilor", "i"), ("ilor", "i"), ("elor", "e"), ("ului", ""),
    ("atei", "at"), ("aţia", "aţi"), ("aţie", "aţi"),
    ("iile", "i"), ("ile", "ILE"), ("aua", "a"), ("iua", "i"),
    ("iei", "i"), ("ele", "e"), ("ea", "e"), ("ii", "i"), ("ul", ""),
)

_RO_COMBO = []
for grp, rep in (
    (("abilitate", "abilitati", "abilităi", "abilităţi"),
     "abil"),
    (("ibilitate",), "ibil"),
    (("ivitate", "ivitati", "ivităi", "ivităţi"), "iv"),
    (("icitate", "icitati", "icităi", "icităţi",
      "icatori", "icator", "icala", "icale", "icali", "icală",
      "ical", "iciva", "icive", "icivi", "icivă", "iciv"), "ic"),
    (("ativa", "ative", "ativi", "ativă", "ativ", "aţiune",
      "atoare", "atori", "ator", "ătoare", "ători",
      "ător"), "at"),
    (("itiva", "itive", "itivi", "itivă", "itiv", "iţiune",
      "itoare", "itori", "itor"), "it"),
):
    for g in grp:
        _RO_COMBO.append((g, rep))

_RO_STD_DEL = (
    "abila", "abile", "abili", "abilă", "abil", "ibila", "ibile",
    "ibili", "ibilă", "ibil", "oasa", "oasă", "oase", "osi",
    "oşi", "os", "itate", "itati", "ităi", "ităţi",
    "ata", "ată", "ati", "ate", "at", "uta", "ută", "uti",
    "ute", "ut", "ita", "ită", "iti", "ite", "it", "anta",
    "ante", "anti", "antă", "ant", "atori", "ator", "ica",
    "ice", "ici", "ică", "ic", "iva", "ive", "ivi", "ivă",
    "iv",
)
_RO_STD_IST = ("ista", "iste", "isti", "istă", "işti",
               "isme", "ism", "ist")
_RO_STD_IUNE = ("iune", "iuni")

_RO_VERB_1 = (
    "aserăţi", "iserăţi", "userăţi",
    "âserăţi", "aserăm", "iserăm",
    "userăm", "âserăm", "aseşi", "iseşi",
    "useşi", "âseşi", "aseră", "iseră",
    "useră", "âseră", "arăţi",
    "irăţi", "urăţi", "ârăţi",
    "eaţi", "iaţi", "eşte", "ăşte",
    "eşti", "ăşti", "arăm", "irăm",
    "urăm", "ârăm", "ească", "indu",
    "ându", "ează", "esc", "ăsc", "ind", "ând",
    "are", "ere", "ire", "âre", "ase", "ise", "use",
    "âse", "eze", "eai", "iai", "aşi", "işi",
    "uşi", "âşi", "eam", "iam", "asem", "isem",
    "usem", "âsem", "ară", "iră", "ură",
    "âră", "eau", "iau", "ea", "ia", "ai", "ui", "ezi",
    "âi", "am", "au", "ez",
)
_RO_VERB_2 = (
    "seserăţi", "seserăm", "seseşi", "seseră",
    "serăţi", "seşi", "serăm", "sesem", "sese",
    "seră", "aţi", "eţi", "iţi",
    "âţi", "sei", "se", "em", "im", "âm", "ăm",
)


def romanian_stem(word: str) -> str:
    # prelude: i/u between vowels -> I/U (live buffer)
    chars = list(word)
    n = len(chars)
    for i in range(1, n - 1):
        if chars[i] in "iu" and chars[i - 1] in _RO_VOWELS \
                and chars[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)
    pv = _rv_es(word, _RO_VOWELS)
    r1, r2 = _r_regions(word, _RO_VOWELS)

    def in_r1(p): return p >= r1
    def in_r2(p): return p >= r2
    def in_rv(p): return p >= pv

    # step 0: unrestricted longest match, then R1 test (no fallback)
    best = max((s for s, _ in _RO_STEP0 if word.endswith(s)),
               key=len, default=None)
    if best is not None:
        rep = dict(_RO_STEP0)[best]
        p = len(word) - len(best)
        if in_r1(p):
            if rep == "ILE":
                if not word[:p].endswith("ab"):
                    word = word[:p] + "i"
            else:
                word = word[:p] + rep

    # standard suffix: repeat combo, then the a_3 among in R2
    removed = False
    while True:
        best = max((s for s, _ in _RO_COMBO if word.endswith(s)),
                   key=len, default=None)
        if best is None:
            break
        rep = dict(_RO_COMBO)[best]
        p = len(word) - len(best)
        if not in_r1(p):
            break
        word = word[:p] + rep
        removed = True
    all_std = ([(s, "del") for s in _RO_STD_DEL]
               + [(s, "ist") for s in _RO_STD_IST]
               + [(s, "iune") for s in _RO_STD_IUNE])
    best = None
    for s, act in all_std:
        if word.endswith(s):
            if best is None or len(s) > len(best[0]):
                best = (s, act)
    if best is not None:
        s, act = best
        p = len(word) - len(s)
        if in_r2(p):
            if act == "del":
                word = word[:p]
                removed = True
            elif act == "ist":
                word = word[:p] + "ist"
                removed = True
            elif act == "iune":
                if p >= 1 and word[p - 1] == "ţ":
                    word = word[:p - 1] + "t"
                    removed = True

    # verb suffix (only if nothing removed): RV-limited matching
    if not removed:
        cands = []
        for s in _RO_VERB_1:
            if word.endswith(s) and in_rv(len(word) - len(s)):
                cands.append((s, 1))
        for s in _RO_VERB_2:
            if word.endswith(s) and in_rv(len(word) - len(s)):
                cands.append((s, 2))
        if cands:
            s, case = max(cands, key=lambda c: len(c[0]))
            p = len(word) - len(s)
            if case == 1:
                # preceded by a non-vowel or by 'u', the preceding char
                # itself INSIDE the RV limit (the among runs under
                # setlimit pV and the condition evaluates before the
                # limit is restored)
                if p - 1 >= pv and (word[p - 1] not in _RO_VOWELS
                                    or word[p - 1] == "u"):
                    word = word[:p]
            else:
                word = word[:p]

    # vowel suffix: unrestricted longest of a/e/ie/i/ă, start in RV
    best = max((s for s in ("ie", "a", "e", "i", "ă")
                if word.endswith(s)), key=len, default=None)
    if best is not None and in_rv(len(word) - len(best)):
        word = word[:-len(best)]

    # postlude
    return word.replace("I", "i").replace("U", "u")

# --- Hungarian (snowballstem.org hungarian algorithm) ----------------------
# (HungarianStemmer.java — R1 starts after the first consonant following
# the initial vowel run, counting cs/dzs/gy/ly/ny/sz/ty/zs digraphs
# whole; nine R1-gated suffix families in fixed order; instrum/factive
# require a double consonant before the suffix and undouble by removing
# the second-to-last char; case deletions finish with the á/é -> a/e
# v_ending; golden-validated on the full vocabulary)

_HU_VOWELS = "aeiouáéíóõöúûü"
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
               "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm",
               "nn", "pp", "rr", "ss", "tt", "vv", "zz")

_HU_CASE = ("képpen", "anként", "enként", "onként", "ként", "képp",
            "ban", "ben", "nak", "nek", "val", "vel", "nál", "nél",
            "ból", "ról", "tól", "bõl", "rõl", "tõl", "hez", "hoz",
            "höz", "kor", "ért", "ba", "ra", "be", "re", "ig", "ul",
            "ül", "an", "en", "on", "ön", "at", "et", "ot", "öt",
            "vá", "vé", "n", "t")
_HU_PLURAL = (("ák", "a"), ("ék", "e"), ("ök", ""), ("ak", ""),
              ("ek", ""), ("ok", ""), ("k", ""))
_HU_OWNED = (("áéi", "a"), ("ééi", "e"), ("aké", ""), ("eké", ""),
             ("oké", ""), ("áké", "a"), ("éké", "e"), ("öké", ""),
             ("éi", ""), ("ké", ""), ("éé", "e"), ("é", ""))
_HU_SING = (("ájuk", "a"), ("éjük", "e"), ("unk", ""), ("ánk", "a"),
            ("énk", "e"), ("ünk", ""), ("juk", ""), ("jük", ""),
            ("ja", ""), ("je", ""), ("ad", ""), ("ed", ""),
            ("od", ""), ("ád", "a"), ("éd", "e"), ("öd", ""),
            ("nk", ""), ("uk", ""), ("ük", ""), ("am", ""),
            ("em", ""), ("om", ""), ("ám", "a"), ("ém", "e"),
            ("a", ""), ("d", ""), ("e", ""), ("m", ""), ("o", ""),
            ("á", "a"), ("é", "e"))
_HU_PLUR = (("jaitok", ""), ("jeitek", ""), ("jaink", ""),
            ("jeink", ""), ("aitok", ""), ("áitok", "a"),
            ("eitek", ""), ("éitek", "e"), ("itek", ""),
            ("jaid", ""), ("jeid", ""), ("jaik", ""), ("jeik", ""),
            ("jaim", ""), ("jeim", ""), ("aink", ""), ("áink", "a"),
            ("eink", ""), ("éink", "e"), ("aid", ""), ("eid", ""),
            ("áid", "a"), ("éid", "e"), ("jai", ""), ("jei", ""),
            ("aik", ""), ("eik", ""), ("áik", "a"), ("éik", "e"),
            ("ink", ""), ("aim", ""), ("eim", ""), ("áim", "a"),
            ("éim", "e"), ("id", ""), ("ai", ""), ("ei", ""),
            ("ái", "a"), ("éi", "e"), ("ik", ""), ("im", ""),
            ("i", ""))


def _hu_r1(word: str) -> int:
    n = len(word)
    if n == 0:
        return 0
    if word[0] in _HU_VOWELS:
        # goto first consonant; digraph at that position counts whole
        for i in range(1, n):
            if word[i] not in _HU_VOWELS:
                for d in _HU_DIGRAPHS:
                    if word.startswith(d, i):
                        return i + len(d)
                return i + 1
        return n
    for i in range(1, n):
        if word[i] in _HU_VOWELS:
            return i + 1
    return n


def _hu_double(w: str) -> bool:
    return w.endswith(_HU_DOUBLES)


def _hu_undouble(w: str) -> str:
    """Remove the second-to-last character (the generated undouble)."""
    return w[:-2] + w[-1] if len(w) >= 2 else w


def hungarian_stem(word: str) -> str:
    r1 = _hu_r1(word)

    def in_r1(p): return p >= r1

    def v_ending(w: str) -> str:
        if w.endswith("á") and len(w) - 1 >= r1:
            return w[:-1] + "a"
        if w.endswith("é") and len(w) - 1 >= r1:
            return w[:-1] + "e"
        return w

    # instrum: al/el in R1, preceded by double; delete + undouble
    for suf in ("al", "el"):
        if word.endswith(suf) and in_r1(len(word) - 2):
            base = word[:-2]
            if _hu_double(base):
                word = _hu_undouble(base)
            break

    # case: longest of a_4, R1, delete, then v_ending
    suf = max((c for c in _HU_CASE if word.endswith(c)),
              key=len, default=None)
    if suf is not None and in_r1(len(word) - len(suf)):
        word = v_ending(word[:-len(suf)])

    # case_special: ánként->a, án->a, én->e (R1)
    suf = max((c for c in ("ánként", "án", "én") if word.endswith(c)),
              key=len, default=None)
    if suf is not None and in_r1(len(word) - len(suf)):
        word = word[:-len(suf)] + ("e" if suf == "én" else "a")

    # case_other: astul/estül del, ástul->a, éstül->e, stul/stül del (R1)
    suf = max((c for c in ("astul", "estül", "ástul", "éstül", "stul",
                           "stül") if word.endswith(c)),
              key=len, default=None)
    if suf is not None and in_r1(len(word) - len(suf)):
        rep = {"ástul": "a", "éstül": "e"}.get(suf, "")
        word = word[:-len(suf)] + rep

    # factive: á/é in R1 preceded by double; delete + undouble
    for suf in ("á", "é"):
        if word.endswith(suf) and in_r1(len(word) - 1):
            base = word[:-1]
            if _hu_double(base):
                word = _hu_undouble(base)
            break

    # owned
    suf = max((c for c, _ in _HU_OWNED if word.endswith(c)),
              key=len, default=None)
    if suf is not None and in_r1(len(word) - len(suf)):
        word = word[:-len(suf)] + dict(_HU_OWNED)[suf]

    # sing_owner
    suf = max((c for c, _ in _HU_SING if word.endswith(c)),
              key=len, default=None)
    if suf is not None and in_r1(len(word) - len(suf)):
        word = word[:-len(suf)] + dict(_HU_SING)[suf]

    # plur_owner
    suf = max((c for c, _ in _HU_PLUR if word.endswith(c)),
              key=len, default=None)
    if suf is not None and in_r1(len(word) - len(suf)):
        word = word[:-len(suf)] + dict(_HU_PLUR)[suf]

    # plural
    suf = max((c for c, _ in _HU_PLURAL if word.endswith(c)),
              key=len, default=None)
    if suf is not None and in_r1(len(word) - len(suf)):
        word = word[:-len(suf)] + dict(_HU_PLURAL)[suf]
    return word

# --- Lovins (1968) research stemmer (snowball lovins algorithm) ------------
# (LovinsStemmer.java — 294 context-conditioned endings A..CC, the
# longest ending whose condition passes wins; one undoubling; one
# longest-match recode from the 34-rule respell table. Conditions read
# the STEM (the part before the candidate ending); golden-validated on
# the full vocabulary.)

_LOVINS_ENDINGS = {
    "alistically": "B", "arizability": "A", "izationally": "B",
    "antialness": "A", "arisations": "A", "arizations": "A",
    "entialness": "A", "allically": "C", "antaneous": "A",
    "antiality": "A", "arisation": "A", "arization": "A",
    "ationally": "B", "ativeness": "A", "eableness": "E",
    "entations": "A", "entiality": "A", "entialize": "A",
    "entiation": "A", "ionalness": "A", "istically": "A",
    "itousness": "A", "izability": "A", "izational": "A",
    "ableness": "A", "arizable": "A", "entation": "A", "entially": "A",
    "eousness": "A", "ibleness": "A", "icalness": "A", "ionalism": "A",
    "ionality": "A", "ionalize": "A", "iousness": "A", "izations": "A",
    "lessness": "A", "ability": "A", "aically": "A", "alistic": "B",
    "alities": "A", "ariness": "E", "aristic": "A", "arizing": "A",
    "ateness": "A", "atingly": "A", "ational": "B", "atively": "A",
    "ativism": "A", "elihood": "E", "encible": "A", "entally": "A",
    "entials": "A", "entiate": "A", "entness": "A", "fulness": "A",
    "ibility": "A", "icalism": "A", "icalist": "A", "icality": "A",
    "icalize": "A", "ication": "G", "icianry": "A", "ination": "A",
    "ingness": "A", "ionally": "A", "isation": "A", "ishness": "A",
    "istical": "A", "iteness": "A", "iveness": "A", "ivistic": "A",
    "ivities": "A", "ization": "F", "izement": "A", "oidally": "A",
    "ousness": "A", "aceous": "A", "acious": "B", "action": "G",
    "alness": "A", "ancial": "A", "ancies": "A", "ancing": "B",
    "ariser": "A", "arized": "A", "arizer": "A", "atable": "A",
    "ations": "B", "atives": "A", "eature": "Z", "efully": "A",
    "encies": "A", "encing": "A", "ential": "A", "enting": "C",
    "entist": "A", "eously": "A", "ialist": "A", "iality": "A",
    "ialize": "A", "ically": "A", "icance": "A", "icians": "A",
    "icists": "A", "ifully": "A", "ionals": "A", "ionate": "D",
    "ioning": "A", "ionist": "A", "iously": "A", "istics": "A",
    "izable": "E", "lessly": "A", "nesses": "A", "oidism": "A",
    "acies": "A", "acity": "A", "aging": "B", "aical": "A", "alism": "B",
    "alist": "A", "ality": "A", "alize": "A", "allic": "BB",
    "anced": "B", "ances": "B", "antic": "C", "arial": "A", "aries": "A",
    "arily": "A", "arity": "B", "arize": "A", "aroid": "A", "ately": "A",
    "ating": "I", "ation": "B", "ative": "A", "ators": "A", "atory": "A",
    "ature": "E", "early": "Y", "ehood": "A", "eless": "A", "elity": "A",
    "ement": "A", "enced": "A", "ences": "A", "eness": "E", "ening": "E",
    "ental": "A", "ented": "C", "ently": "A", "fully": "A", "ially": "A",
    "icant": "A", "ician": "A", "icide": "A", "icism": "A", "icist": "A",
    "icity": "A", "idine": "I", "iedly": "A", "ihood": "A", "inate": "A",
    "iness": "A", "ingly": "B", "inism": "J", "inity": "CC",
    "ional": "A", "ioned": "A", "ished": "A", "istic": "A", "ities": "A",
    "itous": "A", "ively": "A", "ivity": "A", "izers": "F", "izing": "F",
    "oidal": "A", "oides": "A", "otide": "A", "ously": "A", "able": "A",
    "ably": "A", "ages": "B", "ally": "B", "ance": "B", "ancy": "B",
    "ants": "B", "aric": "A", "arly": "K", "ated": "I", "ates": "A",
    "atic": "B", "ator": "A", "ealy": "Y", "edly": "E", "eful": "A",
    "eity": "A", "ence": "A", "ency": "A", "ened": "E", "enly": "E",
    "eous": "A", "hood": "A", "ials": "A", "ians": "A", "ible": "A",
    "ibly": "A", "ical": "A", "ides": "L", "iers": "A", "iful": "A",
    "ines": "M", "ings": "N", "ions": "B", "ious": "A", "isms": "B",
    "ists": "A", "itic": "H", "ized": "F", "izer": "F", "less": "A",
    "lily": "A", "ness": "A", "ogen": "A", "ward": "A", "wise": "A",
    "ying": "B", "yish": "A", "acy": "A", "age": "B", "aic": "A",
    "als": "BB", "ant": "B", "ars": "O", "ary": "F", "ata": "A",
    "ate": "A", "eal": "Y", "ear": "Y", "ely": "E", "ene": "E",
    "ent": "C", "ery": "E", "ese": "A", "ful": "A", "ial": "A",
    "ian": "A", "ics": "A", "ide": "L", "ied": "A", "ier": "A",
    "ies": "P", "ily": "A", "ine": "M", "ing": "N", "ion": "Q",
    "ish": "C", "ism": "B", "ist": "A", "ite": "AA", "ity": "A",
    "ium": "A", "ive": "A", "ize": "F", "oid": "A", "one": "R",
    "ous": "A", "'s": "A", "ae": "A", "al": "BB", "ar": "X", "as": "B",
    "ed": "E", "en": "F", "es": "E", "ia": "A", "ic": "A", "is": "A",
    "ly": "B", "on": "S", "or": "T", "s'": "A", "um": "U", "us": "V",
    "yl": "R", "a": "A", "e": "A", "i": "A", "o": "A", "s": "W",
    "y": "B",
}
_LOV_AA = ("d", "f", "ph", "th", "l", "er", "or", "es", "t")
_LOV_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")
_LOV_RESPELL = (
    ("iev", "ief", None), ("uct", "uc", None), ("umpt", "um", None),
    ("rpt", "rb", None), ("urs", "ur", None), ("istr", "ister", None),
    ("metr", "meter", None), ("olv", "olut", None),
    ("ul", "l", "aio"), ("bex", "bic", None), ("dex", "dic", None),
    ("pex", "pic", None), ("tex", "tic", None), ("ax", "ac", None),
    ("ex", "ec", None), ("ix", "ic", None), ("lux", "luc", None),
    ("uad", "uas", None), ("vad", "vas", None), ("cid", "cis", None),
    ("lid", "lis", None), ("erid", "eris", None),
    ("pand", "pans", None), ("end", "ens", "s"), ("ond", "ons", None),
    ("lud", "lus", None), ("rud", "rus", None), ("her", "hes", "pt"),
    ("mit", "mis", None), ("ent", "ens", "m"), ("ert", "ers", None),
    ("et", "es", "n"), ("yt", "ys", None), ("yz", "ys", None),
)


def _cond_ok(cond: str, stem: str) -> bool:
    L = len(stem)
    last = stem[-1] if L else ""
    if cond == "A":
        return L >= 2
    if cond == "B":
        return L >= 3
    if cond == "C":
        return L >= 4
    if cond == "D":
        return L >= 5
    if cond == "E":
        return L >= 2 and last != "e"
    if cond == "F":
        return L >= 3 and last != "e"
    if cond == "G":
        return L >= 3 and last == "f"
    if cond == "H":
        return L >= 2 and (last == "t" or stem.endswith("ll"))
    if cond == "I":
        return L >= 2 and last not in "oe"
    if cond == "J":
        return L >= 2 and last not in "ae"
    if cond == "K":
        return L >= 3 and (last in "li"
                           or (last == "e" and L >= 3 and stem[-3] == "u"))
    if cond == "L":
        if L < 2 or last in "ux":
            return L >= 2 and last not in "ux"
        if last == "s" and (L < 2 or stem[-2] != "o"):
            return False
        return True
    if cond == "M":
        return L >= 2 and last not in "acem"
    if cond == "N":
        if L < 3:
            return False
        if stem[-3] == "s":
            return L >= 4
        return True
    if cond == "O":
        return L >= 2 and last in "li"
    if cond == "P":
        return L >= 2 and last != "c"
    if cond == "Q":
        return L >= 3 and last not in "ln"
    if cond == "R":
        return L >= 2 and last in "nr"
    if cond == "S":
        return L >= 2 and (stem.endswith("dr")
                           or (last == "t" and not stem.endswith("tt")))
    if cond == "T":
        return L >= 2 and (last == "s"
                           or (last == "t" and not stem.endswith("ot")))
    if cond == "U":
        return L >= 2 and last in "lmnr"
    if cond == "V":
        return L >= 2 and last == "c"
    if cond == "W":
        return L >= 2 and last not in "su"
    if cond == "X":
        return L >= 2 and (last in "li"
                           or (last == "e" and L >= 3 and stem[-3] == "u"))
    if cond == "Y":
        return L >= 2 and stem.endswith("in")
    if cond == "Z":
        return L >= 2 and last != "f"
    if cond == "AA":
        return L >= 2 and stem.endswith(_LOV_AA)
    if cond == "BB":
        return (L >= 3 and not stem.endswith("met")
                and not stem.endswith("ryst"))
    if cond == "CC":
        return L >= 2 and last == "l"
    raise ValueError(cond)


def lovins_stem(word: str) -> str:
    # endings: longest whose condition passes
    best = None
    for end, cond in _LOVINS_ENDINGS.items():
        if word.endswith(end):
            stem = word[:-len(end)]
            if _cond_ok(cond, stem):
                if best is None or len(end) > len(best):
                    best = end
    if best is not None:
        word = word[:-len(best)]
    # undouble
    if word.endswith(_LOV_DOUBLES):
        word = word[:-1]
    # respell (longest match once)
    bm = None
    for pat, rep, notpre in _LOV_RESPELL:
        if word.endswith(pat):
            if notpre and len(word) > len(pat) \
                    and word[-len(pat) - 1] in notpre:
                continue
            if bm is None or len(pat) > len(bm[0]):
                bm = (pat, rep)
    if bm is not None:
        word = word[:-len(bm[0])] + bm[1]
    return word

#: filter-zoo registry (filters.make_snowball_filter / <lang>_stemmed chains)
SNOWBALL_STEMS = {
    "german": german_stem,
    "german2": german2_stem,
    "french": french_stem,
    "spanish": spanish_stem,
    "italian": italian_stem,
    "portuguese": portuguese_stem,
    "russian": russian_stem,
    "danish": danish_stem,
    "norwegian": norwegian_stem,
    "swedish": swedish_stem,
    "dutch": dutch_stem,
    "finnish": finnish_stem,
    "english": english_stem,
    "romanian": romanian_stem,
    "hungarian": hungarian_stem,
    "lovins": lovins_stem,
}

# the Snowball porter variant lives in filters.py next to the 1980
# original; registered here so the golden battery sweeps it too
from .filters import snowball_porter_stem as _sp  # noqa: E402

SNOWBALL_STEMS["porter"] = _sp
