from e4s2024_tpu.data.labels import (
    FACE_PARSER_LABELS,
    CELEBAHQ_LABELS,
    FFHQ_LABELS,
    NUM_SEG_CLASSES,
    celebahq19_to_face12,
    ffhq19_to_face12,
    faceparser19_to_face12,
    label_map_to_one_hot,
)
