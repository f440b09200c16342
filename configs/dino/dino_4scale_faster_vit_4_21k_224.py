# DINO-4scale + FasterViT-4-21K-224 (reference
# dino/config/DINO/DINO_4scale_faster_vit_4_21k_224.py, 12-epoch schedule;
# reproduces the 55.16 box-AP recipe, dino/README.md:25-30).
_base_ = ["coco_transformer.py"]

num_classes = 91

# optimization
lr = 1e-4
lr_backbone = 1e-5
lr_backbone_names = ["backbone"]
lr_linear_proj_names = ["reference_points", "sampling_offsets"]
lr_linear_proj_mult = 0.1
batch_size = 2
weight_decay = 1e-4
epochs = 12
lr_drop = 11
save_checkpoint_interval = 1
clip_max_norm = 0.1

# model
modelname = "dino"
backbone = "faster_vit_4_21k_224"
use_checkpoint = True          # jax.remat over backbone stages
position_embedding = "sine"
pe_temperatureH = 20
pe_temperatureW = 20
return_interm_indices = [1, 2, 3]
enc_layers = 6
dec_layers = 6
dim_feedforward = 2048
hidden_dim = 256
dropout = 0.0
nheads = 8
num_queries = 900
query_dim = 4
num_feature_levels = 4
enc_n_points = 4
dec_n_points = 4
two_stage_type = "standard"
embed_init_tgt = True
num_select = 300
transformer_activation = "relu"
batch_norm_type = "FrozenBatchNorm2d"

# losses
aux_loss = True
set_cost_class = 2.0
set_cost_bbox = 5.0
set_cost_giou = 2.0
cls_loss_coef = 1.0
bbox_loss_coef = 5.0
giou_loss_coef = 2.0
enc_loss_coef = 1.0
interm_loss_coef = 1.0
focal_alpha = 0.25
dec_pred_bbox_embed_share = True
dec_pred_class_embed_share = True

# contrastive denoising
use_dn = True
dn_number = 100
dn_box_noise_scale = 0.4
dn_label_noise_ratio = 0.5
dn_labelbook_size = 91

# ema
use_ema = False
ema_decay = 0.9997
