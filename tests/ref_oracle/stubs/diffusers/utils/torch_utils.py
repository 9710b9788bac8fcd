def maybe_allow_in_graph(cls):  # dynamo hint: identity without torch.compile
    return cls
