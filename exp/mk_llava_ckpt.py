"""Build a tiny llava checkpoint dir for driving the real CLI server."""
import json
import sys

import numpy as np
import torch
import transformers
from safetensors.numpy import save_file
from tokenizers import Tokenizer, decoders, models, pre_tokenizers

out = sys.argv[1]
import os

os.makedirs(out, exist_ok=True)

vision_cfg = transformers.CLIPVisionConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, image_size=24, patch_size=8,
)
text_cfg = transformers.LlamaConfig(
    vocab_size=320, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=256,
)
hf_cfg = transformers.LlavaConfig(
    vision_config=vision_cfg, text_config=text_cfg,
    image_token_index=256, vision_feature_layer=-2,
    vision_feature_select_strategy="default", image_seq_length=9,
)
torch.manual_seed(7)
model = transformers.LlavaForConditionalGeneration(hf_cfg).eval()
sd = {k: v.detach().numpy().astype(np.float32)
      for k, v in model.state_dict().items()}
save_file(sd, f"{out}/model.safetensors")
d = hf_cfg.to_dict()
d["model_type"] = "llava"
with open(f"{out}/config.json", "w") as f:
    json.dump(d, f)

alphabet = pre_tokenizers.ByteLevel.alphabet()
vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
tok = Tokenizer(models.BPE(vocab, []))
tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
tok.decoder = decoders.ByteLevel()
tok.add_special_tokens(["<image>"])
tok.save(f"{out}/tokenizer.json")
print("ok", out)
