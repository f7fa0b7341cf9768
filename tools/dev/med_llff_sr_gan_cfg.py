"""Medium synthetic-LLFF joint-SR convergence config at the PUBLISHED
l1+gan objective (reference fern_lg_joint_l1+gan.py minus the VGG
perceptual term, whose weights the zero-egress image lacks): G step with
adversarial loss through the UNet-SN discriminator, D step training.
Curves artifact: profile_r3/curves_med_gan/ (VERDICT round-2 item 2)."""
_base_ = '/root/repo/tools/dev/med_llff_sr_cfg.py'

expname = 'med_sr_gan'

fine_train = dict(
    weight_gan=0.05,
)
