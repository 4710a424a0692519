from ner_spark.model.tagger import (  # noqa: F401
    ENTITY_TYPES,
    N_TAGS,
    TAG_NAMES,
    tag_id_to_name,
    token_logits_batch,
    transitions,
    viterbi_batch,
)
