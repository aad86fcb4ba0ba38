"""Chat REPL logic tests (tiny model, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from aria_tpu.cli.chat import AriaChat
from aria_tpu.config import AriaConfig
from aria_tpu.data.tokenizer import ByteTokenizer
from aria_tpu.engine.generate import Engine
from aria_tpu.models.aria import init_aria_params

import dataclasses

# tiny model that accepts real 490px processor output (35x35 = 1225 patches)
_T = AriaConfig.tiny()
TINY = _T.replace(
    vision=dataclasses.replace(_T.vision, image_size=490),
    projector=dataclasses.replace(_T.projector, patch_to_query=((1225, 8),)),
)


@pytest.fixture(scope="module")
def chat():
    params = init_aria_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
    engine = Engine(params, TINY, max_seq_len=512, cache_dtype=jnp.float32)
    return AriaChat(engine, ByteTokenizer(), max_image_size=490, max_new_tokens=6,
                    temperature=0.0)


class TestChat:
    def test_multi_turn_history(self, chat):
        chat.reset()
        r1 = chat.ask("hi")
        assert isinstance(r1, str)
        assert len(chat.history) == 2  # user + assistant
        r2 = chat.ask("again")
        assert len(chat.history) == 4
        roles = [m["role"] for m in chat.history]
        assert roles == ["user", "assistant", "user", "assistant"]

    def test_reset(self, chat):
        chat.reset()
        assert chat.history == [] and chat.images == []

    def test_image_attachment(self, chat):
        chat.reset()
        img = Image.fromarray(np.random.RandomState(0).randint(0, 255, (98, 98, 3), np.uint8))
        chat.add_image(img)
        chat.ask("what is this?")
        # the image content must be recorded on the first user message
        types = [c["type"] for c in chat.history[0]["content"]]
        assert "image" in types
