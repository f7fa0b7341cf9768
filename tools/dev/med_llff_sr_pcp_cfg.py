"""Medium synthetic-LLFF joint-SR convergence config at the FULL PUBLISHED
objective weights (reference configs/llff/fern_lg_joint_l1+gan.py:17-19:
weight_pcp=0.5, weight_gan=0.05, weight_style=0.2) with every loss term
LIVE: the perceptual/style tower runs on the deterministic fixed-seed
random VGG (fine_train.allow_random_vgg) because the zero-egress image has
no pretrained VGG19 weights. Curves artifact: profile_r4/curves_med_pcp/
(VERDICT round-3 item 4)."""
_base_ = '/root/repo/tools/dev/med_llff_sr_cfg.py'

expname = 'med_sr_pcp'

fine_train = dict(
    weight_pcp=0.5,
    weight_gan=0.05,
    weight_style=0.2,
    allow_random_vgg=True,
)
