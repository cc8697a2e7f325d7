from instacart_next_order_recommendation_tpu.train.trainer import main

main()
