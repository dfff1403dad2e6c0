#!/usr/bin/env python3
"""Generate deterministic test fixtures (FIXTURES.md shapes) into
src/test/resources/. Pure stdlib, seed fixed — rerunning reproduces the
same bytes. These are unit-test fixtures authored for this repo; the
driver's testdata under /root/testdata is separate and read-only.
"""
import json, os, random

random.seed(7)
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")
os.makedirs(os.path.join(OUT, "meddra", "MedAscii"), exist_ok=True)

DRUGS = [
    # (medicinalproduct, generic, brand, substance)
    ("Aspirinol", ["aspirinol"], ["AspiBrand"], ["ASPIRINOL ACID"]),
    ("Betamax", ["betamaxine"], [], ["BETAMAXINE"]),
    ("Gammacure", ["gammacurine"], ["GammaPlus", "Gammacure"], []),
    ("Deltazol", [], None, None),            # null openfda arrays
    ("Epsilon^s remedy", ["epsilonine"], [], []),  # caret apostrophe
    ("Zetaquil", ["zetaquiline"], ["ZetaBrand"], ["zetaquiline"]),  # dupes
]
REACTIONS = [
    "headache", "nausea", "dizziness", "rash", "anaphylactic shock",
    "crohn^s disease",      # caret-encoded apostrophe
    "drug ineffective",     # blacklisted
    "  fatigue  ",          # needs trim
]

def report(rid, drugs, reactions, qualification="1", death=None, serious="1",
           drugchar="1"):
    def drug_obj(d):
        mp, gen, brand, sub = d
        o = {"medicinalproduct": mp, "drugcharacterization": drugchar}
        ofda = {}
        if gen is not None: ofda["generic_name"] = gen
        if brand is not None: ofda["brand_name"] = brand
        if sub is not None: ofda["substance_name"] = sub
        if ofda: o["openfda"] = ofda
        return o
    r = {
        "safetyreportid": str(rid),
        "serious": serious,
        "receivedate": "20200101",
        "primarysource": {"qualification": qualification},
        "patient": {
            "reaction": [{"reactionmeddrapt": x} for x in reactions],
            "drug": [drug_obj(d) for d in drugs],
        },
    }
    if death is not None:
        r["seriousnessdeath"] = death
    return r

reports = []
rid = 1000
# bulk: random drug/reaction combos, professional reporters, non-fatal
for _ in range(80):
    nd = random.randint(1, 2)
    nr = random.randint(1, 3)
    reports.append(report(rid, random.sample(DRUGS, nd),
                          random.sample(REACTIONS[:6], nr),
                          qualification=random.choice("123")))
    rid += 1
# edge cases
reports.append(report(rid := rid + 1, [DRUGS[0]], ["headache"], death="1"))      # dropped: death
reports.append(report(rid := rid + 1, [DRUGS[1]], ["nausea"], qualification="4"))  # dropped: consumer
reports.append(report(rid := rid + 1, [DRUGS[2]], ["rash"], qualification=None))   # dropped: null qual
reports.append(report(rid := rid + 1, [DRUGS[3]], ["dizziness"], drugchar="2"))    # dropped: concomitant
reports.append(report(rid := rid + 1, [DRUGS[4]], ["crohn^s disease"]))            # caret both sides
reports.append(report(rid := rid + 1, [DRUGS[5]], ["drug ineffective"]))           # blacklisted only
reports.append(report(rid := rid + 1, [DRUGS[0]], ["  fatigue  ", "headache"]))    # trim
rep_missing = report(rid := rid + 1, [("", [], [], [])], ["headache"])             # empty drug name only
reports.append(rep_missing)
# strong-signal cluster: Gammacure → "angioedema severe", a reaction that is
# globally rare (appears ONLY via this drug) while Gammacure also occurs with
# common reactions in the bulk. Under the LRT Monte-Carlo null (drug reports
# assigned to its reactions ∝ global popularity) this pair must clear the
# critical value — the pipeline's positive control.
for _ in range(30):
    reports.append(report(rid := rid + 1, [DRUGS[2]], ["angioedema severe"]))

with open(os.path.join(OUT, "faers_sample.jsonl"), "w") as f:
    for r in reports:
        f.write(json.dumps(r, sort_keys=True) + "\n")

# ChEMBL dictionary: covers the drugs above via name/tradeNames/synonyms,
# plus extra ignored fields to prove projection.
chembl = [
    {"id": "CHEMBL0001", "name": "ASPIRINOL", "synonyms": ["Aspirinol acid"],
     "tradeNames": ["AspiBrand"], "drugType": "small molecule",
     "canonicalSmiles": "CC(=O)X"},
    {"id": "CHEMBL0002", "name": "BETAMAXINE", "synonyms": ["Betamax"],
     "tradeNames": [], "yearOfFirstApproval": 1999},
    {"id": "CHEMBL0003", "name": "GAMMACURINE", "synonyms": ["Gammacure"],
     "tradeNames": ["GammaPlus"]},
    {"id": "CHEMBL0004", "name": "DELTAZOL", "synonyms": [], "tradeNames": []},
    {"id": "CHEMBL0005", "name": "EPSILONINE", "synonyms": ["Epsilon's remedy"],
     "tradeNames": []},
    {"id": "CHEMBL0006", "name": "ZETAQUILINE", "synonyms": ["Zetaquil"],
     "tradeNames": ["ZetaBrand"]},
    # null synonyms → contributes nothing (reference flatten-null parity)
    {"id": "CHEMBL0007", "name": "NULLSYN", "tradeNames": []},
]
with open(os.path.join(OUT, "drug_dict.jsonl"), "w") as f:
    for r in chembl:
        f.write(json.dumps(r, sort_keys=True) + "\n")

# Blacklist: leading whitespace, mixed case, caret apostrophe
with open(os.path.join(OUT, "blacklist.txt"), "w") as f:
    f.write("Drug ineffective\n")
    f.write("   adverse drug reaction\n")
    f.write("DRUG INTERACTION\n")
    f.write("patient^s condition aggravated\n")

# MedDRA .asc: $-separated, runs of $$ (empty fields), trailing $
with open(os.path.join(OUT, "meddra", "MedAscii", "pt.asc"), "w") as f:
    f.write("10019211$Headache$10019231$$$$$$$$$\n")
    f.write("10028813$Nausea$10018012$$$$$$$$$\n")
    f.write("10013573$Dizziness$10019231$$$$$$$$$\n")
    f.write("10037844$Rash$10040785$$$$$$$$$\n")
    f.write("10002198$Anaphylactic shock$10021428$$$$$$$$$\n")
    f.write("10011401$Crohn^s disease$10017969$$$$$$$$$\n")
    f.write("10002424$Angioedema severe$10002425$$$$$$$$$\n")
with open(os.path.join(OUT, "meddra", "MedAscii", "llt.asc"), "w") as f:
    f.write("10019080$Headache$10019211$$$$$$$$\n")
    f.write("10019211$Head ache$10019211$$$$$$$$\n")
    f.write("10016254$Fatigue$10016256$$$$$$$$\n")
    f.write("10945678$Nausea$10028813$$$$$$$$\n")

print("fixtures written to", OUT)
