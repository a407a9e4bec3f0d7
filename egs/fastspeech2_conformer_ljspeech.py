# FastSpeech 2 with conformer encoder/decoder (reference encoder_type /
# decoder_type = 'conformer' option, Models/encoder.py:115-160).
# Relative-position attention runs the bias-input flash kernel
# (DESIGN.md §3); train step ~145 ms at the 32x1024 bucket.
architecture = "text-mel"
model = "Fastspeech2"

train_script = "data/ljspeech/train.txt"
test_script = "data/ljspeech/test.txt"
mean_file = "data/ljspeech/mean.npy"
var_file = "data/ljspeech/var.npy"
lengths_file = "data/ljspeech/lengths.npy"

vocab_size = 152
mel_dim = 80

encoder_type = "conformer"
d_model_encoder = 384
n_layer_encoder = 6
n_head_encoder = 4
ff_conv_kernel_size_encoder = 5

decoder_type = "conformer"
d_model_decoder = 384
n_layer_decoder = 6
n_head_decoder = 4
ff_conv_kernel_size_decoder = 1
postnet_pred = True
reduction_rate = 1

optimizer = "Noam"
warmup_step = 4000
warmup_factor = 1.0
max_epoch = 200
save_per_epoch = 50
batch_size = 32

f0_min = 71.0
f0_max = 795.8
nbins = 256
save_dir = "ckpt_fs2_conformer"
