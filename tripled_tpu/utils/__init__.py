from tripled_tpu.utils.inputs import dummy_train_inputs
