# DINO-4scale + FasterViT-4-21K-384 (reference
# dino/config/DINO/DINO_4scale_faster_vit_4_21k_384_36ep.py).
_base_ = ["dino_4scale_faster_vit_4_21k_224.py"]

backbone = "faster_vit_4_21k_384"
epochs = 36
lr_drop = 30
