from simhand_tpu.mining.similar_hands import mine_similar_hands, topk_similar
