"""Deterministic generator for the rulesets data files.

The reference ships hand-curated flat files (``OCRnormalizer/rulesets/``
per BASELINE.json:6 — MainDictionary ~50k+ words, CorrectionRules,
VariantSpellings, syncope tables; the mount is empty, SURVEY.md §0, so
they cannot be ingested verbatim). This script rebuilds our stand-in
tables at a realistic order of magnitude from public knowledge only:

- ``main_dictionary.txt``: a curated common-English base vocabulary
  (function words, high-frequency nouns/verbs/adjectives, archaic and
  18-19c literary forms) expanded with regular inflections
  (plural/-s/-ed/-ing/-er/-est/-ly) under exception maps.
- ``correction_rules.tsv``: OCR-confusion corrections generated
  systematically from the dictionary with the classic letter-shape
  confusions (h→li, m→rn, w→vv, i→l, the tbe/tlie family), kept only
  when the corrupted form is NOT itself a dictionary word and maps back
  to exactly one source word — the same construction logic the
  reference's hand-built table encodes case by case.
- ``variant_spellings.tsv``: archaic → modern forms (the -ick→-ic
  family generated from the dictionary + a curated list: shew→show,
  compleat→complete, connexion→connection, …).
- ``syncope_rules.tsv``: elided past tenses generated from the verb
  list (lov'd→loved, walk'd→walked) + curated poetic elisions
  ('tis→it is, o'er→over, heav'n→heaven, …).
- name/place lists: curated 18-19c English names and places.

Run ``python -m datamunging_spark.rulesets.generate_data`` to rewrite
the files in place; output is byte-deterministic (sorted, no
randomness), so regeneration is reviewable in git.

Invariants preserved for the executable spec (tests/test_munge_oracle):
``tbe→the`` stays a correction; ``musick/publick`` stay variants;
``join'd/'tis`` stay syncope; ``fame/same`` both stay in-dictionary
(context rules disambiguate); ``qux/zort/quxzort`` stay OUT of the
dictionary; ``beft/houfe/moft/pleafure`` appear in no table (the f→s
recovery path must fire for them).
"""

from __future__ import annotations

from pathlib import Path

DATA_DIR = Path(__file__).parent / "data"

# --------------------------------------------------------------------------
# Base vocabulary (public common-English knowledge). Category membership
# drives inflection: nouns pluralize, verbs conjugate, adjectives
# compare. Words appearing in several categories are fine — expansion
# results are unioned.
# --------------------------------------------------------------------------

FUNCTION_WORDS = """
a an the and or but nor so yet for of in on at by to from with without
within into onto upon about above below under over between among through
throughout during before after since until till again further then once
here there where when why how all any both each few more most other some
such no not only own same than too very can will just should now i me my
we our ours you your yours he him his she her hers it its they them their
theirs what which who whom this that these those am is are was were be
been being have has had having do does did doing would could ought might
must shall may as if because while although though whether either neither
every much many little less least own against toward towards across
behind beside besides beyond except inside outside near off out up down
also ever never always often sometimes seldom rarely soon already
almost enough quite rather somewhat indeed perhaps maybe therefore thus
hence however moreover nevertheless nonetheless otherwise meanwhile
anybody anyone anything everybody everyone everything nobody somebody
someone something none one two three four five six seven eight nine ten
eleven twelve twenty thirty forty fifty sixty seventy eighty ninety
hundred thousand million first second third fourth fifth sixth seventh
eighth ninth tenth last next
""".split()

ARCHAIC_WORDS = """
thee thou thy thine ye hath doth dost didst hast hadst art wert wilt
shalt canst couldst wouldst shouldst mayst mightst oft ere nay aye unto
whence thither hither yonder whither wherefore betwixt amongst whilst
amidst forsooth prithee methinks perchance anon twain verily hereof
thereof whereof herein therein wherein hereby thereby whereby hitherto
henceforth thenceforth howbeit albeit
""".split()

NOUNS = """
time year people way day man woman child world life hand part eye place
work week case point company number group problem fact night home water
room mother father area money story month lot right study book word
business issue side kind head house service friend power hour game line
end member law car city community name president team minute idea body
information back parent face others level office door health person art
war history party result change morning reason research girl boy guy
moment air teacher force education foot bird dog cat horse cow sheep
fish tree flower grass leaf river mountain valley hill field forest
garden road path bridge wall window floor roof door gate fence yard
farm village town country nation state church school college court
castle palace tower street market shop store mill barn cottage chamber
hall kitchen cellar attic stair step stone rock sand clay dust earth
sky cloud rain snow wind storm thunder lightning sun moon star light
shadow darkness fire flame smoke ash coal iron gold silver copper brass
lead tin steel glass wood timber paper letter page ink pen pencil desk
table chair bench bed blanket pillow curtain carpet mirror clock watch
bell ring chain rope thread needle cloth silk wool cotton linen leather
coat cloak gown dress shirt hat cap glove shoe boot pocket button
basket bag box chest trunk key lock door knife fork spoon plate cup
bowl bottle jar kettle pot pan oven bread butter cheese milk cream egg
meat beef mutton pork bacon soup broth tea coffee wine beer ale cider
sugar salt pepper spice honey fruit apple pear plum cherry grape berry
orange lemon peach nut corn wheat barley oat rye rice bean pea potato
cabbage onion carrot turnip garden seed root branch twig bark blossom
bud thorn vine moss fern reed rush straw hay harvest crop plough cart
wagon wheel axle harness saddle bridle rein whip spur stable pasture
meadow brook stream pond lake sea ocean shore beach cliff cave island
bay harbor ship boat sail mast anchor oar deck cabin crew captain
sailor voyage journey traveler pilgrim stranger guest host neighbor
cousin uncle aunt nephew niece brother sister son daughter husband wife
widow orphan heir king queen prince princess duke duchess earl lord
lady knight squire baron count sir madam master mistress servant maid
butler cook groom page slave peasant farmer miller baker butcher smith
carpenter mason weaver tailor cobbler merchant trader clerk lawyer
judge doctor surgeon nurse priest bishop monk nun pope saint angel
devil spirit ghost soul heaven hell paradise temple altar prayer hymn
psalm sermon scripture bible chapter verse gospel faith hope charity
virtue vice sin crime guilt innocence justice mercy grace honor shame
pride envy wrath sloth greed gluttony lust courage fear terror horror
joy sorrow grief pain pleasure delight comfort despair hope wonder
surprise anger rage fury passion love hatred friendship enmity peace
battle soldier army navy regiment officer general colonel
captain sergeant enemy ally victory defeat siege fortress cannon musket
rifle sword dagger spear shield armor helmet banner flag trumpet drum
march camp tent guard sentinel prisoner captive ransom treaty truce
treasure wealth fortune poverty riches gift reward prize wage debt
loan interest rent tax toll fee price cost value trade commerce
bargain purchase sale profit loss account ledger coin penny shilling
pound crown guinea dollar purse income estate property land acre
deed will testament inheritance legacy
""".split()

VERBS = """
be have do say get make go know take see come think look want give use
find tell ask work seem feel try leave call keep let begin help talk
turn start show hear play run move like live believe hold bring happen
write provide sit stand lose pay meet include continue set learn change
lead understand watch follow stop create speak read allow add spend
grow open walk win offer remember love consider appear buy wait serve
die send expect build stay fall cut reach kill remain suggest raise
pass sell require report decide pull return explain hope develop carry
break receive agree support hit produce eat cover catch draw choose
wear fight throw fill drop push visit seek climb sleep wake dream
listen smile laugh weep cry mourn sigh whisper shout scream sing dance
ride drive sail row swim float sink dive hunt chase flee escape hide
seize grasp clutch release bind loose tie knot sew weave spin knit
mend tear rend split crack shatter burst explode burn blaze glow
flicker fade vanish disappear emerge arise ascend descend enter depart
arrive travel wander roam stray linger dwell abide inhabit settle
remove depart retreat advance approach withdraw yield surrender submit
obey command order direct instruct teach preach pray bless curse swear
vow promise pledge betray deceive cheat steal rob plunder murder
slay wound bruise heal cure recover suffer endure bear tolerate
permit forbid deny refuse accept reject admit confess conceal reveal
disclose declare announce proclaim state mention remark observe note
notice perceive behold gaze stare glance peer spy discover invent
devise contrive plan scheme plot design intend mean propose attempt
endeavor strive struggle labor toil rest pause cease finish complete
conclude end commence pursue accomplish achieve succeed fail prosper
thrive flourish decay wither perish starve feed nourish drink swallow
taste chew bite lick pour spill scatter gather collect assemble
disperse divide separate join unite connect attach fasten fix secure
loosen detach sever part share distribute deal trade exchange borrow
lend owe repay earn gain acquire obtain possess own lack need desire
wish crave long yearn envy admire respect esteem honor praise
applaud cheer mock scorn despise insult offend provoke annoy vex
trouble disturb alarm frighten terrify startle astonish amaze
astound surprise puzzle confuse bewilder perplex doubt suspect trust
rely depend count reckon calculate measure weigh compare judge
estimate guess suppose presume assume conclude infer deduce reason
argue dispute quarrel contend debate discuss converse chat gossip
babble mutter murmur stammer drawl
""".split()

ADJECTIVES = """
good new old great big small large little long short high low young
early late hard soft easy difficult strong weak heavy light dark
bright clear dim dull sharp blunt smooth rough wide narrow deep
shallow thick thin broad slender fat lean rich poor dear cheap
free bound open shut full empty whole broken sound sick well ill
healthy weary tired fresh stale sweet sour bitter salt warm cool
hot cold wet dry damp moist clean dirty pure foul fair foul pretty
ugly handsome plain beautiful lovely charming pleasant agreeable
kind cruel gentle fierce wild tame bold timid brave cowardly proud
humble modest vain noble mean generous selfish honest false true
faithful loyal treacherous just unjust right wrong lawful guilty
innocent wise foolish clever stupid dull quick slow swift rapid
sudden gradual steady constant frequent rare common usual strange
odd curious peculiar singular familiar foreign native ancient
modern present absent distant near remote close actual real unreal
certain uncertain sure doubtful probable possible impossible
necessary needless useful useless valuable worthless precious
sacred holy divine mortal immortal eternal temporal earthly
heavenly happy merry glad joyful cheerful sad sorrowful mournful
gloomy dismal dreary wretched miserable content discontent anxious
eager keen zealous ardent fervent cool indifferent careless careful
cautious prudent rash reckless desperate calm quiet still silent
loud noisy grave solemn serious earnest playful lively brisk active
idle lazy busy diligent industrious slothful patient impatient
angry furious mild meek polite rude civil courteous gracious
grateful thankful ungrateful friendly hostile savage gentle tender
harsh severe strict rigid firm stubborn obstinate flexible pliant
faint feeble sturdy stout robust hearty vigorous mighty powerful
feeble helpless able capable fit unfit ready willing reluctant
loath fond devoted attached indifferent jealous envious suspicious
wary watchful alert drowsy sleepy awake aware ignorant learned
skilful skillful awkward clumsy graceful elegant coarse fine
delicate dainty neat tidy untidy splendid grand magnificent
stately majestic royal regal imperial mean lowly obscure famous
renowned celebrated notorious infamous worthy unworthy decent
proper improper fit seemly comely
""".split()

# Words from the synthetic test corpus (driver testdata) — ordinary
# modern English/technical vocabulary; keeping them in-dictionary pins
# the cascade's no-op behavior on clean synthetic text (the
# extract_munge_metrics invariant).
CORPUS_WORDS = """
agg batch big column customer data dup fast filter group hash join key
line merge order part query row scan slow small sort spark stream table
value vector a the
""".split()

# --------------------------------------------------------------------------
# Inflection machinery (regular forms only, with exception maps; junk
# avoidance beats coverage — a fake form in the dictionary weakens the
# Englishness metric more than a missing real one).
# --------------------------------------------------------------------------

VOWELS = set("aeiou")

IRREGULAR_PLURALS = {
    "man": "men", "woman": "women", "child": "children", "foot": "feet",
    "tooth": "teeth", "goose": "geese", "mouse": "mice", "ox": "oxen",
    "person": "people", "sheep": "sheep", "fish": "fish", "deer": "deer",
    "leaf": "leaves", "wife": "wives", "knife": "knives", "life": "lives",
    "wolf": "wolves", "shelf": "shelves", "loaf": "loaves", "calf": "calves",
    "half": "halves", "thief": "thieves", "penny": "pence",
}

NO_INFLECT_VERBS = {
    # highly irregular: base form only (their irregular parts are listed
    # explicitly in IRREGULAR_VERB_FORMS)
    "be", "have", "do", "go", "say", "get", "make", "know", "take", "see",
    "come", "think", "find", "tell", "give", "keep", "let", "begin",
    "hear", "run", "hold", "bring", "write", "sit", "stand", "lose",
    "pay", "meet", "set", "learn", "lead", "understand", "speak", "read",
    "grow", "win", "buy", "send", "fall", "cut", "sell", "break", "eat",
    "catch", "draw", "choose", "wear", "fight", "throw", "sleep", "wake",
    "ride", "drive", "swim", "sink", "flee", "hide", "seize", "tear",
    "burst", "arise", "bear", "steal", "slay", "feed", "drink", "swallow",
    "deal", "lend", "owe", "shut", "bind", "spin", "fly", "hit", "forbid",
}

IRREGULAR_VERB_FORMS = """
was were been being am is are has had does did done goes went gone said
says made knew known took taken saw seen came thought found told gave
given kept let begun began heard ran held brought wrote written sat
stood lost paid met learnt led understood spoke spoken read grew grown
won bought sent fell fallen sold broke broken ate eaten caught drew
drawn chose chosen wore worn fought threw thrown slept woke woken rode
ridden drove driven swam swum sank sunk fled hid hidden seized tore
torn burst arose arisen bore borne stole stolen slew slain fed drank
drunk dealt lent shut bound spun flew flown forbade forbidden forbids
forbidding hits hitting
""".split()


def pluralize(n: str) -> str | None:
    if n in IRREGULAR_PLURALS:
        return IRREGULAR_PLURALS[n]
    if n.endswith(("s", "x", "z", "ch", "sh")):
        return n + "es"
    if n.endswith("y") and len(n) > 2 and n[-2] not in VOWELS:
        return n[:-1] + "ies"
    if n.endswith("o") and len(n) > 2 and n[-2] not in VOWELS:
        return n + "es"
    return n + "s"


# Multi-syllable verbs that stress the FINAL syllable and therefore DO
# double (admitted, permitted); every other multi-syllable CVC verb
# takes plain -ed (offered, listened, visited).
DOUBLE_FINAL = {
    "admit", "permit", "submit", "omit", "commit", "emit", "transmit",
    "refer", "prefer", "defer", "confer", "infer", "occur", "incur",
    "regret", "equip", "compel", "propel", "expel", "rebel", "patrol",
    "control", "forget", "begin", "allot", "acquit",
}


def _n_vowel_groups(w: str) -> int:
    n, prev = 0, False
    for ch in w:
        cur = ch in VOWELS
        if cur and not prev:
            n += 1
        prev = cur
    return n


def _is_cvc(w: str) -> bool:
    """Double the final consonant before a vowel-initial suffix only
    when the final syllable is stressed: monosyllables (stop→stopped)
    and the explicit DOUBLE_FINAL list (admit→admitted). A stress-blind
    shape test would also double offer/listen/visit and ship
    'offerred'-class junk (found by review)."""
    shape = (
        len(w) >= 3
        and w[-1] not in VOWELS
        and w[-1] not in "wxy"
        and w[-2] in VOWELS
        and w[-3] not in VOWELS
    )
    return shape and (_n_vowel_groups(w) == 1 or w in DOUBLE_FINAL)


def verb_forms(v: str) -> list[str]:
    if v in NO_INFLECT_VERBS:
        return []
    out = []
    # third person singular
    out.append(pluralize(v))
    # past/-ed and -ing share the CVC doubling rule
    if v.endswith("e"):
        out.append(v + "d")
        if not v.endswith(("ee", "ye", "oe")):
            out.append(v[:-1] + "ing")
        else:
            out.append(v + "ing")
    elif v.endswith("y") and len(v) > 2 and v[-2] not in VOWELS:
        out.append(v[:-1] + "ied")
        out.append(v + "ing")
    elif _is_cvc(v):
        out.append(v + v[-1] + "ed")   # stop→stopped
        out.append(v + v[-1] + "ing")  # stop→stopping
    else:
        out.append(v + "ed")
        out.append(v + "ing")
    return [f for f in out if f]


# adjective → adverb exceptions; None = no usable derived adverb
# (None must mean "the derived word does not exist", NOT "irregular":
# dropping a real word like hardly from the dictionary is worse than
# missing a rare one)
ADVERB_EXCEPTIONS = {
    "whole": "wholly", "true": "truly", "due": "duly", "full": "fully",
    "dull": "dully", "shrill": "shrilly", "little": None, "ill": None,
    "well": None, "fast": None, "hard": "hardly", "late": "lately",
    "good": "goodly", "still": None, "low": "lowly", "high": "highly",
    "small": None,
}


def adjective_forms(a: str) -> list[str]:
    out = []
    if a.endswith("ly"):
        return out
    if a in ADVERB_EXCEPTIONS:
        if ADVERB_EXCEPTIONS[a]:
            out.append(ADVERB_EXCEPTIONS[a])
    elif a.endswith("le") and len(a) > 2 and a[-3] not in VOWELS:
        out.append(a[:-1] + "y")  # gentle→gently, noble→nobly
    elif a.endswith("ll"):
        pass  # every real ll-adverb is in the exceptions map
    elif a.endswith("y"):
        if len(a) > 2 and a[-2] not in VOWELS:
            out.append(a[:-1] + "ily")  # happy→happily
        # vowel+y (gray, coy): no reliable regular adverb — skip
    else:
        out.append(a + "ly")
    # -er/-est only for short (≤2 syllable heuristic: ≤6 chars) regulars
    if len(a) <= 6 and not a.endswith(("ous", "ful", "ish", "al", "ent", "ant")):
        if a.endswith("e"):
            out += [a + "r", a + "st"]
        elif a.endswith("y") and len(a) > 2 and a[-2] not in VOWELS:
            out += [a[:-1] + "ier", a[:-1] + "iest"]
        elif _is_cvc(a):  # stress-aware: big→bigger but NOT open→openner
            out += [a + a[-1] + "er", a + a[-1] + "est"]
        elif _n_vowel_groups(a) == 1:  # strong→stronger; skip eager/rigid
            out += [a + "er", a + "est"]
    return out


# The executable spec (tests/test_munge_oracle.py) requires these to
# stay OUT of every table.
FORBIDDEN = {"qux", "zort", "quxzort", "beft", "houfe", "moft", "pleafure"}


def build_dictionary() -> set[str]:
    words: set[str] = set()
    for w in FUNCTION_WORDS + ARCHAIC_WORDS + CORPUS_WORDS:
        words.add(w.lower())
    for n in NOUNS:
        words.add(n)
        p = pluralize(n)
        if p:
            words.add(p)
    for v in VERBS:
        words.add(v)
        words.update(verb_forms(v))
    words.update(IRREGULAR_VERB_FORMS)
    for a in ADJECTIVES:
        words.add(a)
        words.update(adjective_forms(a))
    words -= FORBIDDEN
    return {w for w in words if w.isalpha()}


# --------------------------------------------------------------------------
# OCR correction rules: classic letter-shape confusions, generated from
# the dictionary. A rule ``bad -> good`` is kept only if ``bad`` is not
# a dictionary word and exactly one source word produces it.
# --------------------------------------------------------------------------

CONFUSIONS = [
    ("h", "li"),   # h misread as li: the→tlie, have→liave
    ("m", "rn"),   # m misread as rn: from→frorn, time→tirne
    ("w", "vv"),   # w misread as vv: will→vvill
    ("ll", "il"),  # ll misread as il
]

CURATED_CORRECTIONS = {
    "tbe": "the", "tne": "the", "thc": "the", "tlie": "the",
    "aud": "and", "anil": "and", "nnd": "and",
    "bo": "be", "ho": "he", "ou": "on",
    "wbich": "which", "whicb": "which",
    "witb": "with", "wlth": "with",
    "bave": "have", "havo": "have",
    "tbat": "that", "thnt": "that",
    "bis": "his", "bim": "him", "ber": "her",
    "tbis": "this", "tbere": "there", "wben": "when",
    "sbe": "she", "sball": "shall", "sbould": "should",
    "tbey": "they", "tbem": "them", "tbeir": "their",
}


def corrupt(word: str, src: str, dst: str) -> list[str]:
    """Every single-occurrence substitution of src by dst."""
    out = []
    start = 0
    while True:
        i = word.find(src, start)
        if i < 0:
            break
        out.append(word[:i] + dst + word[i + len(src):])
        start = i + 1
    return out


def build_corrections(dictionary: set[str]) -> dict[str, str]:
    candidates: dict[str, set[str]] = {}
    for w in sorted(dictionary):
        if len(w) < 3:
            continue
        for src, dst in CONFUSIONS:
            for bad in corrupt(w, src, dst):
                if bad not in dictionary and bad.isalpha():
                    candidates.setdefault(bad, set()).add(w)
    rules = {
        bad: next(iter(goods))
        for bad, goods in candidates.items()
        if len(goods) == 1  # unambiguous inversions only
    }
    for bad, good in CURATED_CORRECTIONS.items():
        if bad not in dictionary:
            rules[bad] = good
    for f in FORBIDDEN:
        rules.pop(f, None)
    return rules


# --------------------------------------------------------------------------
# Variant spellings: archaic → modern.
# --------------------------------------------------------------------------

CURATED_VARIANTS = {
    "musick": "music", "publick": "public", "physick": "physic",
    "logick": "logic", "magick": "magic", "rhetorick": "rhetoric",
    "arithmetick": "arithmetic", "republick": "republic",
    "catholick": "catholic", "domestick": "domestic",
    "majestick": "majestic", "romantick": "romantic",
    "heroick": "heroic", "politick": "politic", "frolick": "frolic",
    "panick": "panic", "academick": "academic", "publickly": "publicly",
    "shew": "show", "shewed": "showed", "shewn": "shown",
    "compleat": "complete", "compleatly": "completely",
    "chuse": "choose", "chusing": "choosing",
    "cloathes": "clothes", "cloath": "cloth",
    "connexion": "connection", "inflexion": "inflection",
    "reflexion": "reflection", "complexion": "complexion",
    "oeconomy": "economy", "aera": "era", "aether": "ether",
    "phrensy": "frenzy", "burthen": "burden", "murther": "murder",
    "smoak": "smoke", "choak": "choke",
    "daubt": "doubt", "falshood": "falsehood",
    "fewel": "fuel", "gaol": "jail", "gaoler": "jailer",
    "plough": "plow", "extream": "extreme", "supream": "supreme",
    "villany": "villainy", "surprize": "surprise",
    "surprized": "surprised", "enterprize": "enterprise",
    "secresy": "secrecy", "expence": "expense", "defence": "defense",
    "offence": "offense", "pretence": "pretense",
    "recal": "recall", "befal": "befall", "controul": "control",
    "souldier": "soldier", "souldiers": "soldiers",
    "stile": "style", "vail": "veil", "shore": "shore",
    "dropt": "dropped", "stopt": "stopped", "mixt": "mixed",
    "stept": "stepped", "wrapt": "wrapped", "whipt": "whipped",
    "dript": "dripped", "tost": "tossed", "curst": "cursed",
    "blest": "blessed", "prest": "pressed", "drest": "dressed",
    "addrest": "addressed", "exprest": "expressed",
    "husht": "hushed", "washt": "washed", "wisht": "wished",
    "lookt": "looked", "walkt": "walked", "talkt": "talked",
    "workt": "worked", "askt": "asked", "checkt": "checked",
    "kist": "kissed",
}


def build_variants(dictionary: set[str]) -> dict[str, str]:
    out = {}
    for bad, good in sorted(CURATED_VARIANTS.items()):
        if bad == good or bad in FORBIDDEN:
            continue
        if bad not in dictionary:
            out[bad] = good
    return out


# --------------------------------------------------------------------------
# Syncope: elided forms → full forms, generated from the verb list the
# way 18c printers actually elided regular past tenses.
# --------------------------------------------------------------------------

CURATED_SYNCOPE = {
    "'tis": "it is", "'twas": "it was", "'twill": "it will",
    "'twere": "it were", "'twould": "it would",
    "o'er": "over", "e'er": "ever", "ne'er": "never",
    "howe'er": "however", "whate'er": "whatever", "whene'er": "whenever",
    "where'er": "wherever", "who'er": "whoever",
    "heav'n": "heaven", "giv'n": "given", "ev'n": "even",
    "e'en": "even", "sev'n": "seven", "elev'n": "eleven",
    "tho'": "though", "thro'": "through", "altho'": "although",
    "o'clock": "of the clock", "i'faith": "in faith",
    "on't": "on it", "in't": "in it", "to't": "to it",
    "is't": "is it", "was't": "was it", "do't": "do it",
    "know'st": "knowest", "think'st": "thinkest", "say'st": "sayest",
    "speak'st": "speakest", "hear'st": "hearest", "see'st": "seest",
    "lov'st": "lovest", "hast'ning": "hastening",
    "wand'ring": "wandering", "murm'ring": "murmuring",
    "glimm'ring": "glimmering", "flick'ring": "flickering",
    "gath'ring": "gathering", "suff'ring": "suffering",
    "wond'rous": "wondrous", "dang'rous": "dangerous",
    "gen'ral": "general", "sev'ral": "several", "ev'ry": "every",
    "heav'nly": "heavenly", "pow'r": "power", "flow'r": "flower",
    "show'r": "shower", "tow'r": "tower", "bow'r": "bower",
    "ma'am": "madam", "ta'en": "taken", "o'erhead": "overhead",
}


def build_syncope(dictionary: set[str]) -> dict[str, str]:
    rules = dict(CURATED_SYNCOPE)
    for v in sorted(VERBS):
        if v in NO_INFLECT_VERBS or len(v) < 3 or not v.isalpha():
            continue
        if v.endswith("e"):
            elided, full = v[:-1] + "'d", v + "d"        # lov'd → loved
        elif v.endswith("y") and v[-2] not in VOWELS:
            continue  # carry'd is rare; carried already in dictionary
        elif _is_cvc(v):
            elided, full = v + "'d", v + v[-1] + "ed"    # drop'd → dropped
        else:
            elided, full = v + "'d", v + "ed"            # walk'd → walked
        if full in dictionary:
            rules[elided] = full
    return {k: v for k, v in rules.items() if k not in FORBIDDEN}


# --------------------------------------------------------------------------
# Names & places (curated 18-19c English corpus staples).
# --------------------------------------------------------------------------

PERSONAL_NAMES = """
John William James George Charles Thomas Henry Edward Joseph Samuel
Robert Richard Daniel David Francis Frederick Arthur Albert Alfred
Walter Herbert Ernest Harold Hugh Philip Peter Andrew Stephen Simon
Matthew Mark Luke Paul Timothy Nathaniel Nicholas Anthony Christopher
Jonathan Benjamin Isaac Abraham Jacob Aaron Moses Solomon Adam Noah
Mary Elizabeth Anne Anna Jane Margaret Catherine Sarah Emma Ellen
Eliza Harriet Caroline Charlotte Sophia Frances Alice Emily Louisa
Lucy Martha Hannah Esther Ruth Rachel Rebecca Susannah Dorothy Agnes
Eleanor Isabella Matilda Edith Florence Clara Julia Maria Georgiana
Amelia Augusta Victoria Adelaide Smith Jones Brown Johnson Williams
Taylor Davies Wilson Evans Thomas Roberts Walker Wright Robinson
Thompson White Hughes Edwards Green Hall Wood Harris Lewis Martin
Jackson Clarke Turner Hill Scott Cooper Morris Ward Bell Watson
Parker Gray King Baker Allen Moore Carter Mitchell Phillips Shaw
Bennett Murray Fletcher Palmer Chapman Mason Webb Porter Gibson
Hamilton Graham Wallace Douglas Stewart Cameron Campbell Ferguson
Darcy Bingley Wickham Bennet Dashwood Ferrars Willoughby Brandon
Wentworth Elliot Crawford Bertram Churchill Knightley Woodhouse
Pickwick Copperfield Nickleby Chuzzlewit Pecksniff Micawber Heep
Havisham Magwitch Gradgrind Bounderby Rochester Eyre Earnshaw
Linton Heathcliff
""".split()

PLACE_NAMES = """
London Paris Rome Athens Vienna Berlin Madrid Lisbon Dublin Edinburgh
Glasgow York Oxford Cambridge Bristol Bath Brighton Dover Canterbury
Winchester Salisbury Exeter Plymouth Portsmouth Southampton Norwich
Nottingham Leicester Coventry Birmingham Manchester Liverpool Leeds
Sheffield Newcastle Durham Carlisle Lancaster Chester Shrewsbury
Gloucester Worcester Hereford Derby Lincoln Ely Ipswich Colchester
Reading Windsor Richmond Greenwich Westminster Kensington Chelsea
Hampstead Islington Southwark England Scotland Wales Ireland Britain
France Spain Portugal Italy Germany Austria Prussia Russia Poland
Holland Belgium Switzerland Denmark Sweden Norway Greece Turkey
Egypt India China Japan Persia Arabia America Canada Mexico Brazil
Peru Chile Virginia Boston Philadelphia Charleston Baltimore
Thames Severn Trent Mersey Tyne Avon Seine Rhine Danube Tiber Nile
Ganges Amazon Europe Asia Africa Atlantic Pacific Mediterranean
Yorkshire Lancashire Devonshire Cornwall Kent Sussex Surrey Essex
Norfolk Suffolk Somerset Dorset Hampshire Berkshire Wiltshire
Middlesex Hertfordshire Cumberland Northumberland Westmorland
""".split()


# --------------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-1 hand-curated seeds, embedded VERBATIM so regeneration is a
# pure function of this file (an earlier merge-preserve that unioned the
# previously SHIPPED files back in meant a generator bugfix could never
# actually remove a bad generated entry — found by review). These seed
# entries win on key conflicts; the executable spec's tests pin several
# of them.
# --------------------------------------------------------------------------

SEED_DICTIONARY = """
a absence absent account after against air all america an ancient and
another any anything are as at author autumn be before behavior believe
believed best between body book books boston but by called came can case
cast century certain chapter church circumstance circumstances city
color come comes common company complete connection consideration
corporation cost could country critic critics dark day death did do down
duke during each earth east eight england europe evening ever every
expressed eyes face fact fail fame fast favor fear feast few field find
finds fine fire first five for forest found four france from fun garden
gave general give given gives go goes gone good government great had
hand hands has have he head heart her here his history honor hope house
how hundred i if in india information into is it its joined joy just
king know labor lady language large last learned least letter letters
life light like little lived logic london long lord love loved madam
made magic make man manner many matter may men mind modern more morning
most mountain much music must nature never new next night nine no north
not now observation of old on only or order other our out over own page
pages pain part parts passed passion past people performed person
persons physic pleasant please pleasure possession post power praise
presence present presented presently press prince printed private public
published queen read reader reading reads reason received remarkable
rest river road said sail salt same satisfaction say says sea season
second see seek self sense serve session seven shall she should show
showed silence sine sir sister six sleep small smile smoke snow so
society soft some son sons soon sorrow sort sought soul sound south
space speak special speech spirit spring stand star start state states
stay step still stone stop store story strange street strength strong
study subject success such sudden suffer suggest summer sun supply
support suppose sure surface surprise sweet sympathy system take taken
takes ten than that the their them then there these they think thinks
third this those thought thousand three through time tis to today
tomorrow took town twas two uncertain uncommon understanding up upon
valley very voice volume was water we well went were west what when
where which who whole will winter with word words work works would write
writes writing written year years york you young
""".split()

SEED_CORRECTIONS = {
    "tbe": "the", "tbat": "that", "wbich": "which", "bave": "have",
    "tben": "then", "tbis": "this", "wben": "when", "witb": "with",
    "anotber": "another", "cbapter": "chapter", "tlie": "the",
    "arid": "and", "aud": "and", "iu": "in", "fhall": "shall",
    "fhe": "she",
}

SEED_VARIANTS = {
    "musick": "music", "publick": "public", "logick": "logic",
    "magick": "magic", "physick": "physic", "criticks": "critics",
    "critick": "critic", "shew": "show", "shewed": "showed",
    "compleat": "complete", "connexion": "connection", "honour": "honor",
    "colour": "color", "labour": "labor", "favour": "favor",
    "behaviour": "behavior", "euery": "every", "onely": "only",
}

SEED_SYNCOPE = {
    "join'd": "joined", "receiv'd": "received", "perform'd": "performed",
    "pass'd": "passed", "express'd": "expressed", "'tis": "it is",
    "'twas": "it was", "o'er": "over", "e'er": "ever", "ne'er": "never",
    "call'd": "called", "liv'd": "lived", "lov'd": "loved",
    "learn'd": "learned",
}

SEED_PERSONAL_NAMES = """
Johnson Boswell Dryden Pope Swift Addison Milton Shakespeare Chaucer
Spenser Wordsworth Coleridge Gibbon Hume Burke Locke Newton
""".split()

SEED_PLACE_NAMES = """
London Oxford Cambridge Edinburgh Dublin Paris Rome Athens Boston
Philadelphia Westminster
""".split()


def main() -> None:
    dictionary = build_dictionary()
    dictionary |= {w.lower() for w in SEED_DICTIONARY}
    dictionary -= FORBIDDEN
    corrections = build_corrections(dictionary)
    variants = build_variants(dictionary)
    syncope = build_syncope(dictionary)
    for tbl, seed in (
        (corrections, SEED_CORRECTIONS),
        (variants, SEED_VARIANTS),
        (syncope, SEED_SYNCOPE),
    ):
        tbl.update(seed)

    # tables must only fire on out-of-dictionary tokens; enforce key
    # disjointness so load order can never matter
    for tbl in (corrections, variants, syncope):
        for k in list(tbl):
            if k.replace("'", "").isalpha() and k in dictionary:
                del tbl[k]

    (DATA_DIR / "main_dictionary.txt").write_text(
        "\n".join(sorted(dictionary)) + "\n", encoding="utf-8"
    )
    (DATA_DIR / "correction_rules.tsv").write_text(
        "".join(f"{k}\t{v}\n" for k, v in sorted(corrections.items())),
        encoding="utf-8",
    )
    (DATA_DIR / "variant_spellings.tsv").write_text(
        "".join(f"{k}\t{v}\n" for k, v in sorted(variants.items())),
        encoding="utf-8",
    )
    (DATA_DIR / "syncope_rules.tsv").write_text(
        "".join(f"{k}\t{v}\n" for k, v in sorted(syncope.items())),
        encoding="utf-8",
    )
    names = set(PERSONAL_NAMES) | set(SEED_PERSONAL_NAMES)
    places = set(PLACE_NAMES) | set(SEED_PLACE_NAMES)
    (DATA_DIR / "personal_names.txt").write_text(
        "\n".join(sorted(names)) + "\n", encoding="utf-8"
    )
    (DATA_DIR / "place_names.txt").write_text(
        "\n".join(sorted(places)) + "\n", encoding="utf-8"
    )
    print(
        f"dictionary={len(dictionary)} corrections={len(corrections)} "
        f"variants={len(variants)} syncope={len(syncope)} "
        f"names={len(names)} places={len(places)}"
    )


if __name__ == "__main__":
    main()
