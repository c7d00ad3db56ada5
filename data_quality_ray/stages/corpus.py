"""Deterministic caption corpus shared by the fixture generator and the
perplexity language model. No external data; a single integer seed governs
all sampling."""

from __future__ import annotations

import random

ADJ = ["small", "large", "bright", "dark", "old", "young", "quiet", "busy",
       "red", "green", "wooden", "shiny", "narrow", "wide", "calm", "rusty"]
NOUN = ["dog", "cat", "mountain", "river", "city", "garden", "child", "bicycle",
        "market", "bridge", "forest", "harbor", "tower", "boat", "window", "train"]
VERB = ["standing", "running", "resting", "walking", "playing", "waiting",
        "sitting", "sleeping", "floating", "turning"]
PLACE = ["park", "street", "kitchen", "field", "beach", "station", "museum",
         "valley", "square", "garden"]

TEMPLATES = [
    "a photo of a {adj} {noun} {verb} in the {place}",
    "the {adj} {noun} is {verb} near the {place}",
    "an image of the {noun} and a {adj2} {noun2} at the {place}",
    "a {adj} {noun} with a {adj2} {noun2} {verb} by the {place}",
    "there is a {adj} {noun} {verb} next to the {place} in the morning",
    "a close up view of a {adj} {noun} {verb} on the {place}",
]

# out-of-domain rare words for the high-perplexity ("word salad") class
RARE_WORDS = ["zymurgy", "quixotic", "fjord", "sphinx", "kumquat", "vortex",
              "obelisk", "quasar", "griffin", "zeppelin", "marzipan", "ocelot",
              "falcon", "turbine", "lattice", "prism", "nebula", "glyph"]

# tiny foreign-language caption pools for the langid-drop class
FOREIGN = {
    "es": "el perro corre por la calle y el gato duerme en la casa junto a una ventana grande",
    "fr": "le chien court dans la rue et le chat dort dans la maison près de la fenêtre",
    "de": "der Hund läuft auf der Straße und die Katze schläft in dem Haus neben dem Fenster",
    "zh": "一只小狗在街上跑，一只猫在房子里靠窗睡觉，天气很好",
}


def make_caption(rng: random.Random) -> str:
    t = rng.choice(TEMPLATES)
    return t.format(
        adj=rng.choice(ADJ), adj2=rng.choice(ADJ),
        noun=rng.choice(NOUN), noun2=rng.choice(NOUN),
        verb=rng.choice(VERB), place=rng.choice(PLACE),
    )


def training_sentences(n: int = 3000, seed: int = 1234) -> list[str]:
    """Deterministic in-domain sentences for the perplexity LM."""
    rng = random.Random(seed)
    return [make_caption(rng) for _ in range(n)]


# low-quality token pools for the hashed linear quality classifier's
# negative class (spam / symbol noise / repetition)
JUNK_TOKENS = ["$$$", "!!!", "%%%", "0000", "9999", "@@@", "###", "...",
               "___", "+++", "|||", "~~~"]
SPAM_WORDS = ["buy", "now", "click", "here", "free", "win", "cash", "prize",
              "offer", "deal", "subscribe", "discount", "limited", "act"]


def junk_sentences(n: int = 2000, seed: int = 4321) -> list[str]:
    """Deterministic low-quality sentences (the classifier's negative
    training class): symbol spam, single-word repetition, spam words with
    digit suffixes. Written to a parquet side table by the oracle so the
    SQL re-trains the identical model."""
    rng = random.Random(seed)
    out: list[str] = []
    for _ in range(n):
        style = rng.randrange(3)
        if style == 0:
            out.append(" ".join(rng.choice(JUNK_TOKENS)
                                for _ in range(rng.randrange(4, 12))))
        elif style == 1:
            w = rng.choice(SPAM_WORDS)
            out.append(" ".join([w] * rng.randrange(5, 15)))
        else:
            out.append(" ".join(rng.choice(SPAM_WORDS) + str(rng.randrange(100))
                                for _ in range(rng.randrange(4, 10))))
    return out
