"""Seeded gazetteer of (type, surface) pairs + filler vocabulary.

Plays the role of the reference corpus's entity inventory
(/root/reference/data/train/output.seq.bioattr defines which spans carry
which of the 500 attribute types); here the inventory is a deterministic
literal so every scale of the synthetic transcripts table reuses the same
surfaces — with casing/suffix variations — to give the entity-linking stage
real work (FIXTURES.md F1).
"""

from __future__ import annotations

from functools import lru_cache

from ner_spark.model.tagger import ENTITY_TYPES

# Surfaces per type; each surface is a tuple of lower-case tokens.
SURFACES: dict[str, list[tuple[str, ...]]] = {
    "brand": [
        ("acme",), ("zenith",), ("nordwind",), ("kestrel", "labs"),
        ("blue", "falcon"), ("ironleaf",), ("quanta",), ("vexor",),
        ("orion", "works"), ("halcyon",),
    ],
    "product": [
        ("power", "drill"), ("key", "holder"), ("laptop", "stand"),
        ("water", "bottle"), ("desk", "lamp"), ("card", "wallet"),
        ("trail", "shoe"), ("espresso", "maker"), ("road", "bike"),
        ("notebook",), ("backpack",), ("headphones",),
    ],
    "color": [
        ("crimson",), ("cobalt",), ("emerald",), ("charcoal",),
        ("ivory",), ("amber",), ("slate", "gray"), ("midnight", "blue"),
    ],
    "material": [
        ("carbon", "fiber"), ("stainless", "steel"), ("bamboo",),
        ("leather",), ("titanium",), ("merino", "wool"), ("ceramic",),
    ],
    "size": [
        ("extra", "large"), ("medium",), ("compact",), ("king", "size"),
        ("pocket", "sized"), ("oversize",),
    ],
    "place": [
        ("oslo",), ("kyoto",), ("lisbon",), ("porto", "alegre"),
        ("cape", "town"), ("zurich",), ("helsinki",), ("montreal",),
    ],
    "org": [
        ("northbridge", "capital"), ("redwood", "institute"),
        ("atlas", "consortium"), ("pioneer", "guild"), ("vertex", "union"),
        ("summit", "council"),
    ],
    "person": [
        ("ada", "voss"), ("marco", "lindt"), ("yuki", "tanaka"),
        ("elena", "brandt"), ("omar", "haddad"), ("petra", "kovacs"),
    ],
}

# Org/brand mentions sometimes carry a legal suffix; linking must strip it.
ORG_SUFFIXES = ["inc", "ltd", "gmbh", "co"]

FILLER = (
    "the a an of and or with for from into over under about very quite "
    "really please could should would check look find show tell make take "
    "give order ship return review rating price stock deliver compare "
    "spark query table row batch value filter window merge scan join sort "
    "group data line part small fast slow key hash customer today tomorrow "
    "yes no maybe thanks hello okay sure item list detail spec model level "
    "update status report open close start finish run test build plan note"
).split()


@lru_cache(maxsize=1)
def all_surfaces() -> list[tuple[str, tuple[str, ...]]]:
    out = []
    for t in ENTITY_TYPES:
        for s in SURFACES[t]:
            out.append((t, s))
    return out


@lru_cache(maxsize=1)
def token_roles() -> dict[str, list[tuple[int, bool]]]:
    """token -> [(type_idx, is_surface_initial)], the model's gazetteer boost
    table (consumed by ner_spark.model.tagger._token_logits)."""
    roles: dict[str, list[tuple[int, bool]]] = {}
    for t, surf in all_surfaces():
        ti = ENTITY_TYPES.index(t)
        for pos, tok in enumerate(surf):
            r = roles.setdefault(tok, [])
            entry = (ti, pos == 0)
            if entry not in r:
                r.append(entry)
    # Legal suffixes extend org/brand mentions as interior tokens.
    for sfx in ORG_SUFFIXES:
        for tname in ("org", "brand"):
            ti = ENTITY_TYPES.index(tname)
            r = roles.setdefault(sfx, [])
            if (ti, False) not in r:
                r.append((ti, False))
    return roles
