# AR Transformer-TTS parity config (reference train.py path, GST optional)
architecture = "text-mel"
model = "Transformer"

train_script = "data/ljspeech/train.txt"
test_script = "data/ljspeech/test.txt"
mean_file = "data/ljspeech/mean.npy"
var_file = "data/ljspeech/var.npy"
lengths_file = "data/ljspeech/lengths.npy"

vocab_size = 152
mel_dim = 80

d_model_encoder = 384
n_layer_encoder = 6
n_head_encoder = 4
ff_conv_kernel_size_encoder = 5
d_model_decoder = 384
n_layer_decoder = 6
n_head_decoder = 4
ff_conv_kernel_size_decoder = 1
reduction_rate = 2
gst = False

optimizer = "Noam"
warmup_step = 4000
max_seqlen = 10000
# Frame-budget packing order: True (default) packs length-sorted for
# ~12%/frame tighter buckets on TPU; the reference packs in script
# order (datasets_fastspeech2.py:749-813). Set False for literal
# reference batch-composition parity (PARITY.md "Data layer").
sort_by_length = True
max_epoch = 1000
save_per_epoch = 50
clip = 1.0
amp = True
accum_grad = 1
positive_weight = 5.0

save_dir = "checkpoints/transformer_ljspeech"
