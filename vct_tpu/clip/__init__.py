from vct_tpu.clip.vision import CLIPVisionTower, preprocess_frames  # noqa: F401
from vct_tpu.clip.frames import sample_frames, parse_ext_type  # noqa: F401
from vct_tpu.clip.text import (  # noqa: F401
    CLIPBPETokenizer,
    CLIPTextTower,
    build_text_encoder,
)
